"""Query corpus — the engine's operator inventory as runnable queries.

Each query exists twice: an idiomatic DataFrame/Spark-SQL build (the
engine under test) and an ANSI-SQL oracle string (run by DuckDB over the
same parquet tables). The driver's correctness gate executes both at
sf=0.01 and hash-compares results; ``tests/test_oracle.py`` replicates
that gate locally.
"""

from etl_process_spark.queries.registry import QUERIES, QuerySpec, query  # noqa: F401
from etl_process_spark.queries import parity  # noqa: F401  (registers)
from etl_process_spark.queries import llmdata  # noqa: F401  (registers)
from etl_process_spark.queries import streams  # noqa: F401  (registers)
from etl_process_spark.queries import media  # noqa: F401  (registers)
from etl_process_spark.queries import analytics  # noqa: F401  (registers)
from etl_process_spark.queries import tpch_shapes  # noqa: F401  (registers)
from etl_process_spark.queries import behavior  # noqa: F401  (registers)
from etl_process_spark.queries import curation  # noqa: F401  (registers)
