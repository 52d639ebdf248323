"""The fraud report — the reference's one real analytical query.

Re-expresses ``py_scripts/report.py:12-113`` as a composable DataFrame
pipeline: a 5-way left-join denormalization (``cl``), a 9-lag per-card
event-time window (``lg``), and four rule predicates UNION ALL-ed.

Parity corners kept deliberately:
* terminals join is point-in-time with STRICT inequalities (report.py:40-41);
* cards/accounts/clients join the FULL history tables, not the current
  version — exactly as the reference does (report.py:42-47), duplicate
  versions and all;
* ``concat_ws`` for fio (Postgres concat treats NULL as '', report.py:23);
* blacklist default entry date 9999-12-31 via coalesce (report.py:29);
* UNION ALL bag semantics — one transaction can emit up to 4 rows;
* ``report_dt`` (the reference's ``now()``, report.py:76) is injectable.

Scale: dims broadcast (small by construction); the only shuffle in the whole
report is the per-card window, which partitions by card_num — high
cardinality, no skew (a card has few transactions), so it parallelizes
linearly with executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_process_spark.functions.scalar import INFINITY_DATE, fio, seconds_between
from etl_process_spark.operators.asof import asof_join


def enrich_transactions(
    transactions: DataFrame,
    terminals_hist: DataFrame,
    cards_hist: DataFrame,
    accounts_hist: DataFrame,
    clients_hist: DataFrame,
    blacklist: DataFrame,
) -> DataFrame:
    """The ``cl`` CTE (report.py:12-49): fact -> 5 left joins."""
    cl = asof_join(
        transactions, terminals_hist,
        fact_key="terminal", dim_key="terminal_id", fact_ts="trans_date",
        strict=True, only_live=True, how="left",
    )
    cards = F.broadcast(cards_hist.alias("c"))
    accounts = F.broadcast(accounts_hist.alias("acc"))
    clients = F.broadcast(clients_hist.alias("cli"))
    bl = F.broadcast(blacklist.alias("bl"))
    cl = (
        cl.join(cards, F.trim(F.col("f.card_num")) == F.trim(F.col("c.card_num")), "left")
        .join(accounts, F.col("c.account_num") == F.col("acc.account_num"), "left")
        .join(clients, F.col("acc.client") == F.col("cli.client_id"), "left")
        .join(bl, F.trim(F.col("cli.passport_num")) == F.trim(F.col("bl.passport_num")), "left")
    )
    return cl.select(
        F.col("f.trans_id").alias("trans_id"),
        F.col("f.trans_date").alias("trans_date"),
        F.col("f.card_num").alias("card_num"),
        F.col("f.oper_type").alias("oper_type"),
        F.col("f.amt").alias("amt"),
        F.col("f.oper_result").alias("oper_result"),
        F.col("f.terminal").alias("terminal"),
        F.col("acc.valid_to").alias("valid_to"),
        fio("cli.last_name", "cli.first_name", "cli.patronymic").alias("fio"),
        F.col("cli.passport_num").alias("passport_num"),
        F.col("cli.passport_valid_to").alias("passport_valid_to"),
        F.col("cli.phone").alias("phone"),
        F.col("bl.passport_num").alias("pass_bl"),
        F.coalesce(F.col("bl.entry_dt"), F.to_date(F.lit(INFINITY_DATE))).alias("entry_dt"),
        F.col("d.terminal_city").alias("terminal_city"),
    )


def with_lags(cl: DataFrame) -> DataFrame:
    """The ``lg`` CTE (report.py:50-62): 9 lag columns over one window spec."""
    w = Window.partitionBy("card_num").orderBy("trans_date")
    return cl.select(
        "card_num", "trans_date", "terminal_city", "fio", "passport_num",
        "phone", "trans_id", "oper_type", "oper_result", "amt",
        F.lag("terminal_city").over(w).alias("lag_city"),
        seconds_between(F.col("trans_date"), F.lag("trans_date").over(w)).alias("lag_pr_sec"),
        F.lag("oper_result", 1).over(w).alias("res_1"),
        F.lag("oper_result", 2).over(w).alias("res_2"),
        F.lag("oper_result", 3).over(w).alias("res_3"),
        F.lag("amt", 1).over(w).alias("amt_1"),
        F.lag("amt", 2).over(w).alias("amt_2"),
        F.lag("amt", 3).over(w).alias("amt_3"),
        F.lag("trans_date", 3).over(w).alias("dt"),
    )


def _event(df: DataFrame, event_type: int, report_dt) -> DataFrame:
    return df.select(
        F.col("trans_date").alias("event_dt"),
        F.col("passport_num").alias("passport"),
        F.col("fio"),
        F.col("phone"),
        F.lit(event_type).alias("event_type"),
        F.to_timestamp(F.lit(str(report_dt))).alias("report_dt"),
    )


def build_fraud_report(cl: DataFrame, report_dt) -> DataFrame:
    """Rules 1–4 UNION ALL (report.py:63-113). ``report_dt`` = pinned now()."""
    lg = with_lags(cl)

    # Rule 1 (report.py:78): expired passport, or blacklisted at event time.
    r1 = cl.filter(
        (F.col("passport_valid_to") < F.col("trans_date"))
        | (F.col("pass_bl").isNotNull() & (F.col("entry_dt") <= F.col("trans_date")))
    )
    # Rule 2 (report.py:88): transaction on/after account expiry.
    r2 = cl.filter(F.col("trans_date") >= F.col("valid_to"))
    # Rule 3 (report.py:98-99): city changed within one hour.
    r3 = lg.filter(
        (F.col("terminal_city") != F.col("lag_city")) & (F.col("lag_pr_sec") <= 3600)
    )
    # Rule 4 (report.py:109-113): SUCCESS after 3 REJECTs, strictly
    # decreasing amounts, all four inside 20 minutes, PAYMENT/WITHDRAW only.
    r4 = lg.filter(
        (F.col("oper_result") == "SUCCESS")
        & (F.col("res_1") == "REJECT") & (F.col("res_2") == "REJECT") & (F.col("res_3") == "REJECT")
        & (F.col("amt") < F.col("amt_1")) & (F.col("amt_1") < F.col("amt_2")) & (F.col("amt_2") < F.col("amt_3"))
        & (seconds_between(F.col("trans_date"), F.col("dt")) <= 1200)
        & F.col("oper_type").isin("PAYMENT", "WITHDRAW")
    )
    return (
        _event(r1, 1, report_dt)
        .unionByName(_event(r2, 2, report_dt))
        .unionByName(_event(r3, 3, report_dt))
        .unionByName(_event(r4, 4, report_dt))
    )
