"""File readers (reference S1/S2/S6).

* ``read_delimited`` — semicolon CSV with header, explicit all-string schema
  (staging layer parity: the reference stages everything as varchar and
  casts on the way to the warehouse, main.ddl:1-9).
* ``read_excel`` — the reference reads ``.xlsx`` via pandas
  (py_scripts/black_list.py:57, terminals.py:54). Spark has no native Excel
  source; the shim goes pandas/openpyxl -> Arrow -> DataFrame and is gated
  behind an import-try since openpyxl may be absent. Excel files are
  driver-sized by nature (human-maintained blacklists/snapshots), so a
  driver-side read is the honest architecture, not a compromise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def string_schema(columns: list[str]) -> T.StructType:
    """All-varchar staging schema (reference main.ddl:1-9)."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


def read_delimited(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str],
    sep: str = ";",
    header: bool = True,
    file_date: str | None = None,
) -> DataFrame:
    """Reference S1: ``pd.read_csv(i, sep=';', header=0)`` -> Spark scan.

    Reads with an explicit string schema (never inferSchema — one pass, and
    staging-layer cast semantics stay explicit). ``file_date`` stamps the
    load date onto every row (S6, terminals.py:55).
    """
    df = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .schema(string_schema(columns))
        .csv(path)
    )
    if file_date is not None:
        df = df.withColumn("update_dt", F.lit(file_date))
    return df


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str,
    columns: list[str],
    file_date: str | None = None,
) -> DataFrame:
    """Reference S2: ``pd.read_excel(path, sheet_name=...)`` -> Spark.

    Requires openpyxl; raises NotImplementedError with guidance if absent
    (tests use CSV/parquet equivalents per SURVEY §2.1-S2).
    """
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name, header=0, index_col=None)
    except ImportError as exc:  # openpyxl missing in this container
        raise NotImplementedError(
            "Excel ingestion needs openpyxl; supply a CSV/parquet equivalent"
        ) from exc
    pdf = pdf.astype("string")
    df = spark.createDataFrame(pdf.where(pdf.notna(), None), schema=string_schema(list(pdf.columns)))
    df = df.toDF(*columns) if len(columns) == len(df.columns) else df
    if file_date is not None:
        df = df.withColumn("update_dt", F.lit(file_date))
    return df
