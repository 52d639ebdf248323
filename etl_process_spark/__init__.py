"""etl_process_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline (``annavelk/ETL-process``):

* staged file / JDBC-style ingestion with high-watermark incremental loads
  (reference ``py_scripts/transaction.py``, ``cards.py``)
* SCD Type 2 dimension history maintenance (``terminals.py``, ``clients.py``)
* a windowed multi-rule fraud report (``py_scripts/report.py``)

plus the large-scale training-data operators a 100 TB pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, text analysis, and multimodal-column plumbing.

Everything is expressed declaratively on the DataFrame/SQL API so Catalyst
plans the physical execution (broadcast vs shuffle joins, predicate pushdown,
whole-stage codegen); Python UDFs appear only where built-ins genuinely
cannot express the semantics, and then always as Arrow-batched Pandas UDFs.
"""

from etl_process_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
