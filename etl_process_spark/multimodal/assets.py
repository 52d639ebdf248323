"""Asset table: the binary-column data model for multimodal pipelines.

Schema contract: one row per media asset —

* ``asset_id``     stable key
* ``media_type``   MIME-ish discriminator (``image/fake`` etc.)
* ``content``      the opaque bytes (BinaryType). At 100 TB this column is
                   either inlined (small assets) or an object-store URI +
                   byte-range; everything downstream only assumes "bytes
                   arrive in the Arrow batch".
* ``meta``         typed struct of intrinsic properties, populated at
                   ingest so planners can filter/partition WITHOUT
                   touching bytes (predicate pushdown on meta.width never
                   decodes an image).

The test/bench corpus is synthesized deterministically from the driver's
``documents`` table: content = utf-8 bytes of the text, metadata derived
from its md5 — reproducible in any engine, no media libraries needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asset_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("width", T.IntegerType()),
                        T.StructField("height", T.IntegerType()),
                        T.StructField("channels", T.IntegerType()),
                        T.StructField("n_bytes", T.LongType()),
                    ]
                ),
            ),
        ]
    )


def _hex_pair(col, pos: int):
    """Integer value of md5 hex chars [pos, pos+1] (0..255), JVM-side."""
    return F.conv(F.substring(col, pos, 2), 16, 10).cast("int")


def synthesize_assets(
    spark: SparkSession, sf_dir: str, media_type: str = "image/fake"
) -> DataFrame:
    """Deterministic asset table from the documents corpus.

    content = utf-8 bytes of the document text; meta.width/height/channels
    come from the content's md5 (16+hex(0:2), 16+hex(2:4), 1+hex(4)%3) —
    the same derivation the fake decoder and the DuckDB oracle use, so
    ingest-time metadata and decode-time observation provably agree.
    """
    from etl_process_spark.operators.dedup import ensure_parallelism

    # spread the narrow test input before the (partition-preserving)
    # decode operators downstream — they inherit this parallelism
    docs = ensure_parallelism(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    content = F.encode(F.col("text"), "UTF-8")
    h = F.md5(content)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.struct(
            (F.lit(16) + _hex_pair(h, 1)).alias("width"),
            (F.lit(16) + _hex_pair(h, 3)).alias("height"),
            (F.lit(1) + F.conv(F.substring(h, 5, 1), 16, 10).cast("int") % 3).alias(
                "channels"
            ),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
