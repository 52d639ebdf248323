"""The fraud-ETL pipeline — parity with the reference's 8-script DAG.

One SparkSession, one driver program; stages are function calls sharing
lazy DataFrames instead of the reference's per-script subprocesses + DB
round-trips (reference main.py:47-50).
"""

from etl_process_spark.pipeline.fraud import build_fraud_report, enrich_transactions, with_lags  # noqa: F401
from etl_process_spark.pipeline.loaders import load_blacklist_file, load_transactions_file  # noqa: F401
