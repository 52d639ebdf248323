"""A real 2-host standalone Spark cluster on loopback aliases.

Shared by the speculation rehearsal (tools/speculation_determinism.py)
and the executor-loss rehearsal (tools/executorloss_determinism.py):
both need scheduler behaviors that local modes cannot produce —
speculative placement refuses a host that already runs an attempt of
the task, and executor loss must take REAL shuffle/checkpoint blocks
with it. A standalone master plus workers pinned to distinct loopback
hostnames (SPARK_LOCAL_HOSTNAME=127.0.0.2 / 127.0.0.3 — all of 127/8
is the loopback interface on Linux) gives the scheduler genuinely
different "hosts" while everything shares one filesystem.

Hardening over the round-9 inline version (per ADVICE):

* the master port is picked DYNAMICALLY (bind-to-0 probe) instead of
  hardcoding 7077, so a stale master from a killed prior run — or any
  other process on the port — cannot make the new master die silently
  with every query failure misattributed to the queries themselves;
* readiness is POLLED from the master / worker logs ("Starting Spark
  master at spark://...", "Successfully registered with master")
  instead of blind 4s/5s sleeps, failing fast with the log tail when a
  daemon dies during startup.

Every daemon is launched in its own process group
(``start_new_session=True``) so ``kill_worker`` can SIGKILL the worker
AND the executor it spawned in one ``killpg`` — killing only the
worker process would leave the executor orphaned, still serving its
shuffle blocks, and no executor loss would actually occur.
"""

from __future__ import annotations

import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

MASTER_HOST = "127.0.0.1"
WORKER_HOSTS = ["127.0.0.2", "127.0.0.3"]


def _free_port(host: str) -> int:
    with socket.socket() as s:
        s.bind((host, 0))
        return s.getsockname()[1]


def _poll_log(log: str, needle: str, timeout: float, what: str) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            text = Path(log).read_text()
        except OSError:
            text = ""
        if needle in text:
            return
        time.sleep(0.2)
    tail = text[-2000:] if text else "<no log output>"
    raise RuntimeError(f"{what} not ready after {timeout}s "
                       f"(waiting for {needle!r}); log tail:\n{tail}")


class MiniCluster:
    """Standalone master + ``n_workers`` workers on distinct loopback
    hostnames, each in its own process group. Context manager; the
    master URL is ``self.master_url`` (also returned by __enter__ for
    the original one-value call sites)."""

    def __init__(self, tag: str = "mini", n_workers: int = 2,
                 cores: int = 4, memory: str = "3g",
                 worker_java_opts: tuple[str, ...] = ()):
        if n_workers > len(WORKER_HOSTS):
            raise ValueError(f"at most {len(WORKER_HOSTS)} workers")
        self.tag = tag
        self.n_workers = n_workers
        self.cores = cores
        self.memory = memory
        # extra -D system properties for the WORKER daemons — e.g. the
        # decommission rehearsal needs spark.decommission.enabled=true
        # ON THE WORKER, because the SIGPWR handler is installed at
        # worker startup only when that conf is set; without it SIGPWR
        # keeps its default disposition and simply TERMINATES the JVM
        # (observed: "worker lost: got disassociated" instead of a
        # graceful drain)
        self.worker_java_opts = tuple(worker_java_opts)
        self.master_proc: subprocess.Popen | None = None
        self.workers: list[subprocess.Popen | None] = [None] * n_workers
        self.master_url = ""
        self._base_env: dict[str, str] = {}
        self._java = ""
        self._cp = ""

    # -- lifecycle -----------------------------------------------------
    def __enter__(self) -> str:
        from pyspark.find_spark_home import _find_spark_home

        spark_home = _find_spark_home()
        self._cp = f"{spark_home}/jars/*"
        self._java = os.path.join(
            os.environ.get("JAVA_HOME", "/usr"), "bin", "java")
        base = dict(os.environ)
        base["SPARK_HOME"] = spark_home
        # executors inherit the WORKER's environment: the repo must be
        # importable (module refs in pickled functions) and the scala
        # version known to the executor command builder
        base["PYTHONPATH"] = os.environ.get("PYTHONPATH", "")
        base["PYSPARK_PYTHON"] = sys.executable
        base.setdefault("SPARK_SCALA_VERSION", "2.13")
        self._base_env = base

        port = _free_port(MASTER_HOST)
        self.master_url = f"spark://{MASTER_HOST}:{port}"
        mlog = self._log("master")
        menv = dict(base)
        menv["SPARK_LOCAL_HOSTNAME"] = MASTER_HOST
        self.master_proc = self._launch(
            ["-Xmx512m", "org.apache.spark.deploy.master.Master",
             "--host", MASTER_HOST, "--port", str(port),
             "--webui-port", "0"], menv, mlog)
        _poll_log(mlog, f"Starting Spark master at {self.master_url}",
                  30, "master")
        for i in range(self.n_workers):
            self.start_worker(i)
        return self.master_url

    def __exit__(self, *exc):
        procs = [p for p in [self.master_proc, *self.workers] if p]
        for p in procs:
            self._killpg(p, signal.SIGTERM)
        deadline = time.time() + 10
        for p in procs:
            try:
                p.wait(timeout=max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                self._killpg(p, signal.SIGKILL)
        return False

    # -- workers -------------------------------------------------------
    def start_worker(self, i: int) -> None:
        host = WORKER_HOSTS[i]
        wlog = self._log(f"worker{i}")
        wenv = dict(self._base_env)
        wenv["SPARK_LOCAL_HOSTNAME"] = host
        self.workers[i] = self._launch(
            ["-Xmx512m", *self.worker_java_opts,
             "org.apache.spark.deploy.worker.Worker",
             "--host", host, "--cores", str(self.cores),
             "--memory", self.memory, "--webui-port", "0",
             self.master_url], wenv, wlog)
        _poll_log(wlog, "Successfully registered with master", 30,
                  f"worker{i} ({host})")

    def kill_worker(self, i: int) -> None:
        """SIGKILL the worker's whole process group — worker AND the
        executor it launched die together, so the executor's shuffle
        files / checkpoint blocks become unreachable instantly (the
        driver notices via the dropped RPC connection, not the master's
        60s heartbeat timeout)."""
        p = self.workers[i]
        if p is None:
            return
        self._killpg(p, signal.SIGKILL)
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            pass
        self.workers[i] = None

    def restart_worker(self, i: int) -> None:
        if self.workers[i] is not None:
            self.kill_worker(i)
        self.start_worker(i)

    # -- plumbing ------------------------------------------------------
    def _log(self, name: str) -> str:
        return f"/tmp/spark_graft_{self.tag}_{name}_{int(time.time()*1e3)}.log"

    def _launch(self, java_args: list[str], env: dict,
                log: str) -> subprocess.Popen:
        fh = open(log, "w")
        return subprocess.Popen(
            [self._java, "-cp", self._cp, *java_args],
            env=env, stdout=fh, stderr=subprocess.STDOUT,
            start_new_session=True,  # own process group: killpg reaches
        )                            # the executors the worker spawns

    @staticmethod
    def _killpg(p: subprocess.Popen, sig: int) -> None:
        try:
            os.killpg(os.getpgid(p.pid), sig)
        except (ProcessLookupError, PermissionError):
            try:
                p.send_signal(sig)
            except ProcessLookupError:
                pass
