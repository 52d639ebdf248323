"""redact_pii pattern behavior on adversarial strings (the oracle query
checks cross-engine agreement; these pin the intended semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_process_spark.operators.text import pii_match_count, redact_pii


def _run(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        "t",
        redact_pii("t").alias("clean"),
        pii_match_count("t").alias("n"),
    ).collect()
    return {r["t"]: (r["clean"], r["n"]) for r in rows}


def test_redaction_shapes(spark):
    got = _run(spark, [
        "mail me at jane.doe+spam@sub.example.co.uk today",
        "call 555-123-4567 or 555.987.6543",
        "server at 192.168.0.1 is down",
        "no pii here at all",
        "a@b.io and 10.0.0.7 and 555-000-1234",
    ])
    assert got["mail me at jane.doe+spam@sub.example.co.uk today"] == (
        "mail me at <EMAIL> today", 1)
    assert got["call 555-123-4567 or 555.987.6543"] == (
        "call <PHONE> or <PHONE>", 2)
    assert got["server at 192.168.0.1 is down"] == (
        "server at <IP> is down", 1)
    assert got["no pii here at all"] == ("no pii here at all", 0)
    assert got["a@b.io and 10.0.0.7 and 555-000-1234"] == (
        "<EMAIL> and <IP> and <PHONE>", 3)


def test_email_wins_over_number_shapes(spark):
    """An address containing digits/dots is ONE email, never half-eaten
    by the phone/IP patterns (order of the chain is load-bearing)."""
    got = _run(spark, ["reach 555.123.4567@example.org now"])
    clean, n = got["reach 555.123.4567@example.org now"]
    assert clean == "reach <EMAIL> now"
    assert n == 1


def test_version_strings_not_ip(spark):
    """A three-part version like 1.2.3 must NOT be redacted (IPv4 needs
    four octets)."""
    got = _run(spark, ["upgrade to spark 4.1.2 soon"])
    assert got["upgrade to spark 4.1.2 soon"] == ("upgrade to spark 4.1.2 soon", 0)
