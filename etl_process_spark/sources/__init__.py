"""Sources & sinks (SURVEY.md §2.1, S1–S10)."""

from etl_process_spark.sources.inbox import DatedInbox  # noqa: F401
from etl_process_spark.sources.readers import read_delimited, read_excel  # noqa: F401
from etl_process_spark.sources.tables import TableCatalog  # noqa: F401
from etl_process_spark.sources.watermark import WatermarkStore  # noqa: F401
