"""Operator library (SURVEY.md §2).

Relational parity operators (SCD2 merge, as-of join, watermark incremental
load) plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing).
"""

from etl_process_spark.operators.asof import asof_join  # noqa: F401
from etl_process_spark.operators.merge import catalog_merge, merge_upsert  # noqa: F401
from etl_process_spark.operators.scd2 import scd2_current, scd2_merge  # noqa: F401
