"""End-to-end drive of etl_process_spark as a user would run it.

Day 1: load transactions CSV, bootstrap terminals dim, run fraud report.
Day 2: terminal T2 moves city, a txn on the same card within an hour at the
new city -> rule 3 must fire; an expired-passport txn -> rule 1.
"""
import os, sys, tempfile
sys.path.insert(0, "/root/repo")

from etl_process_spark.session import get_spark
from etl_process_spark.pipeline.loaders import load_transactions_file
from etl_process_spark.pipeline.fraud import enrich_transactions, build_fraud_report
from etl_process_spark.operators.scd2 import scd2_init, scd2_merge, scd2_current
from pyspark.sql import functions as F, types as T

spark = get_spark("drive-e2e")
inbox = tempfile.mkdtemp()

# --- day 1: transactions file (semicolon CSV, euro decimals) -------------
day1 = os.path.join(inbox, "transactions_01032024.txt")
with open(day1, "w") as f:
    f.write("transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal\n")
    f.write("T001;2024-03-01 10:00:00;1.234,56;CARD1               ;PAYMENT;SUCCESS;A1\n")
    f.write("T002;2024-03-01 10:30:00;200,00;CARD1               ;PAYMENT;SUCCESS;A2\n")
    f.write("T003;2024-03-01 12:00:00;50,00;CARD2               ;WITHDRAW;SUCCESS;A1\n")

fact = load_transactions_file(spark, day1, None)
print("== typed fact day1 =="); fact.show(truncate=False)
assert fact.count() == 3
amt = {r["trans_id"]: str(r["amt"]) for r in fact.collect()}
assert amt["T001"] == "1234.56", amt  # euro decimal parse

# idempotency: re-load same file against existing fact -> 0 new rows
again = load_transactions_file(spark, day1, fact)
print("re-load same file -> new rows:", again.count())
assert again.count() == 0

# --- terminals dim: day1 snapshot, then day2 city change -----------------
snap1 = spark.createDataFrame(
    [("A1", "POS", "Moscow", "addr1"), ("A2", "POS", "Moscow", "addr2")],
    ["terminal_id", "terminal_type", "terminal_city", "terminal_address"])
dim = scd2_init(snap1, "terminal_id", ["terminal_type", "terminal_city", "terminal_address"],
                F.to_timestamp(F.lit("2024-03-01 00:00:00")))
snap2 = spark.createDataFrame(
    [("A1", "POS", "Moscow", "addr1"), ("A2", "POS", "Kazan", "addr2")],
    ["terminal_id", "terminal_type", "terminal_city", "terminal_address"])
dim = scd2_merge(dim, snap2, "terminal_id",
                 ["terminal_type", "terminal_city", "terminal_address"],
                 new_effective_from=F.to_timestamp(F.lit("2024-03-02 00:00:00")),
                 changed_effective_from=F.to_timestamp(F.lit("2024-03-02 00:00:00")),
                 source_keys=snap2, clock="2024-03-02 00:00:00")
print("== terminals dim after day-2 merge =="); dim.orderBy("terminal_id", "effective_from").show(truncate=False)
rows = dim.orderBy("terminal_id", "effective_from").collect()
a2 = [r for r in rows if r["terminal_id"] == "A2"]
assert len(a2) == 2 and str(a2[0]["effective_to"]) == "2024-03-01 23:59:59", a2
assert a2[1]["terminal_city"] == "Kazan" and str(a2[1]["effective_to"]).startswith("9999-12-31")

# --- day 2 transactions: rule 3 (city hop <1h) + rule 1 (expired passport)
day2 = os.path.join(inbox, "transactions_02032024.txt")
with open(day2, "w") as f:
    f.write("transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal\n")
    f.write("T004;2024-03-02 09:00:00;10,00;CARD1               ;PAYMENT;SUCCESS;A1\n")   # Moscow
    f.write("T005;2024-03-02 09:30:00;20,00;CARD1               ;PAYMENT;SUCCESS;A2\n")   # Kazan, 30min -> rule 3
    f.write("T006;2024-03-02 11:00:00;30,00;CARD2               ;PAYMENT;SUCCESS;A1\n")   # expired passport -> rule 1
fact = fact.unionByName(load_transactions_file(spark, day2, fact))

cards = spark.createDataFrame(
    [("CARD1               ", "ACC1"), ("CARD2               ", "ACC2")],
    ["card_num", "account_num"])
accounts = spark.createDataFrame(
    [("ACC1", "C1", "2030-01-01"), ("ACC2", "C2", "2030-01-01")],
    ["account_num", "client", "valid_to"]
).withColumn("valid_to", F.col("valid_to").cast("date"))
clients = spark.createDataFrame(
    [("C1", "Ivanov", "Ivan", None, "P111", "2030-01-01", "+7-1"),
     ("C2", "Petrov", "Petr", "Petrovich", "P222", "2024-01-01", "+7-2")],  # passport expired
    ["client_id", "last_name", "first_name", "patronymic", "passport_num", "passport_valid_to", "phone"]
).withColumn("passport_valid_to", F.col("passport_valid_to").cast("date"))
blacklist = spark.createDataFrame([("2024-02-01", "P999")], ["entry_dt", "passport_num"]) \
    .withColumn("entry_dt", F.col("entry_dt").cast("date"))

cl = enrich_transactions(fact, dim, cards, accounts, clients, blacklist)
report = build_fraud_report(cl, "2024-03-02 23:59:59")
print("== fraud report =="); report.orderBy("event_dt", "event_type").show(truncate=False)
out = [(str(r["event_dt"]), r["event_type"], r["fio"]) for r in report.collect()]
assert ("2024-03-02 09:30:00", 3, "Ivanov Ivan ") in out, out         # rule 3, exact-PG concat: NULL patronymic -> empty, space kept
assert ("2024-03-02 11:00:00", 1, "Petrov Petr Petrovich") in out, out  # rule 1
assert not any(t == 2 for _, t, _ in out), out

# --- late-arriving CDC repair (scd2_rebuild) ------------------------------
# A straggler says A2 was actually in Tver from mid-day-1: the repair must
# split A2's first interval, leave the day-2 Kazan version alone, and not
# touch A1.
from etl_process_spark.operators.scd2 import scd2_rebuild

late = spark.createDataFrame(
    [("A2", "ATM", "Tver", "addr-late", "2024-03-01 12:00:00")],
    ["terminal_id", "terminal_type", "terminal_city", "terminal_address",
     "effective_from"],
).withColumn("effective_from", F.col("effective_from").cast("timestamp"))
dim_before_a1 = sorted(map(tuple, dim.filter(F.col("terminal_id") == "A1").collect()))
dim = scd2_rebuild(
    dim, late, "terminal_id", ["terminal_type", "terminal_city", "terminal_address"]
)
a2 = dim.filter(F.col("terminal_id") == "A2").orderBy("effective_from").collect()
assert [r["terminal_city"] for r in a2] == [a2[0]["terminal_city"], "Tver", "Kazan"], a2
assert str(a2[0]["effective_to"]) == "2024-03-01 11:59:59", a2
assert str(a2[1]["effective_to"]) == "2024-03-01 23:59:59", a2
assert sorted(map(tuple, dim.filter(F.col("terminal_id") == "A1").collect())) == dim_before_a1

# --- testdata parquet read ----------------------------------------------
li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
print("== sf0.001 lineitem ==", li.count(), "rows"); li.show(3)
print("ALL E2E CHECKS PASSED")
