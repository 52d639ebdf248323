"""Scalar function surface (SURVEY.md §2.8).

Every scalar idiom the reference uses, as composable Column helpers. All are
built-in ``pyspark.sql.functions`` compositions — JVM-side, codegen-friendly,
zero Python UDFs (parity with reference §2.10: the reference itself has no
UDFs either).
"""

from etl_process_spark.functions.scalar import (  # noqa: F401
    INFINITY_DATE,
    INFINITY_TS,
    WATERMARK_EPOCH,
    changed_any,
    euro_decimal,
    fio,
    minus_seconds,
    seconds_between,
    trim_eq,
)
