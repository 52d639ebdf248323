"""File readers (reference S1/S2/S6).

* ``read_delimited`` — semicolon CSV with header, explicit all-string schema
  (staging layer parity: the reference stages everything as varchar and
  casts on the way to the warehouse, main.ddl:1-9).
* ``read_excel`` — the reference reads ``.xlsx`` via pandas
  (py_scripts/black_list.py:57, terminals.py:54). Spark has no native Excel
  source and this container has no openpyxl, so the reader parses the
  OOXML zip directly with the stdlib (ECMA-376 is a public format:
  workbook.xml + rels + sharedStrings + worksheet parts) and feeds
  ``createDataFrame`` with an all-string staging schema.
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


def _xlsx_rows(path: str, sheet_name: str) -> list[list[str | None]]:
    """Minimal OOXML (.xlsx) sheet reader — stdlib only.

    An .xlsx file is a zip of XML parts (ECMA-376): workbook.xml names
    the sheets, its .rels maps each to a worksheet part, sharedStrings
    holds deduplicated text. Handles the cell types the reference's
    sources use (shared strings, inline strings, numbers); returns rows
    as lists of strings (staging is stringly-typed, main.ddl:1-9) padded
    to rectangular shape. No styles/formulas/dates-as-serials support —
    those need a full library, and the guard raises clearly on them.
    """
    import re
    import xml.etree.ElementTree as ET
    import zipfile

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    PNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rid = None
        for sh in wb.iter(f"{NS}sheet"):
            if sh.get("name") == sheet_name:
                rid = sh.get(f"{RNS}id")
        if rid is None:
            names = [s.get("name") for s in wb.iter(f"{NS}sheet")]
            raise ValueError(f"sheet {sheet_name!r} not found; workbook has {names}")
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target = next(
            r.get("Target") for r in rels.iter(f"{PNS}Relationship") if r.get("Id") == rid
        )
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{NS}t"))
                for si in ss.iter(f"{NS}si")
            ]
        sheet = ET.fromstring(zf.read("xl/" + target.removeprefix("/xl/").lstrip("/")))
        rows: list[list[str | None]] = []
        width = 0
        for row in sheet.iter(f"{NS}row"):
            cells: dict[int, str | None] = {}
            for c in row.iter(f"{NS}c"):
                ref = c.get("r") or ""
                col_letters = re.match(r"[A-Z]+", ref)
                if not col_letters:
                    continue
                idx = 0
                for ch in col_letters.group():
                    idx = idx * 26 + (ord(ch) - 64)
                idx -= 1
                ctype = c.get("t", "n")
                if ctype == "s":
                    v = c.find(f"{NS}v")
                    cells[idx] = shared[int(v.text)] if v is not None else None
                elif ctype == "inlineStr":
                    cells[idx] = "".join(t.text or "" for t in c.iter(f"{NS}t"))
                elif ctype in ("n", "str", "b"):
                    v = c.find(f"{NS}v")
                    cells[idx] = v.text if v is not None else None
                else:
                    raise NotImplementedError(f"xlsx cell type {ctype!r} unsupported")
            width = max(width, max(cells) + 1 if cells else 0)
            rows.append([cells.get(i) for i in range(max(cells) + 1 if cells else 0)])
        return [r + [None] * (width - len(r)) for r in rows]


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str,
    columns: list[str],
    file_date: str | None = None,
) -> DataFrame:
    """Reference S2: ``pd.read_excel(path, sheet_name=...)`` -> Spark.

    Reads the named sheet with the stdlib OOXML parser above (no
    openpyxl needed), first row as header. Excel files are driver-sized
    by nature (human-maintained blacklists/snapshots,
    black_list.py:57/terminals.py:54), so a driver-side parse feeding
    ``createDataFrame`` is the honest architecture, not a compromise.
    """
    rows = _xlsx_rows(path, sheet_name)
    if not rows:
        raise ValueError(f"sheet {sheet_name!r} in {path} is empty")
    header, data = rows[0], rows[1:]
    ncol = len(header)
    data = [r[:ncol] + [None] * (ncol - len(r)) for r in data]
    names = columns if len(columns) == ncol else [str(h) for h in header]
    df = spark.createDataFrame(data, schema=string_schema(names))
    if file_date is not None:
        df = df.withColumn("update_dt", F.lit(file_date))
    return df


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines scan with an EXPLICIT schema (newline-delimited JSON —
    the interchange format crawls and API dumps arrive in).

    Schema is required thinking at scale: ``inferSchema`` on JSON is a
    full extra pass over 100 TB and can widen types differently per run;
    an explicit DDL string pins one pass and one contract.

    Corrupt-record capture: Spark's PERMISSIVE mode only routes bad
    lines into ``_corrupt_record`` if that column EXISTS in the schema,
    so when a schema is given without it, it is appended automatically —
    otherwise corrupt lines silently become all-NULL rows. Caveat
    (Spark's own restriction): a query referencing ONLY
    ``_corrupt_record`` raises unless the DataFrame is cached first;
    select at least one data column alongside it.
    """
    reader = spark.read
    if schema is not None:
        if "_corrupt_record" not in schema:
            schema = f"{schema}, _corrupt_record string"
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def jdbc_incremental_options(
    url: str,
    table: str,
    watermark: str,
    watermark_expr: str = "coalesce(update_dt, create_dt)",
    partition_col: str | None = None,
    num_partitions: int = 16,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Spark JDBC options for a watermark-incremental pull (reference S3:
    cards.py:50-56 pushes ``WHERE coalesce(update_dt,create_dt) > wm``
    to the source Postgres).

    Pure option construction — unit-testable without a live database.
    The watermark predicate is embedded in a ``dbtable`` subquery, so it
    executes INSIDE the source DB (guaranteed pushdown, independent of
    Spark's pushDownPredicate heuristics): the OLTP side ships only the
    changed rows, never the table.

    ``partition_col`` + bounds split the pull into ``num_partitions``
    parallel range queries — without them a JDBC read is ONE executor
    holding one cursor, the classic single-task ingestion bottleneck.
    Bounds only steer the split (rows outside them still arrive, in the
    edge partitions); derive them from the previous watermark / now() so
    strides stay balanced as history grows.
    """
    sub = f"(SELECT * FROM {table} WHERE {watermark_expr} > '{watermark}') AS src"
    opts: dict[str, str] = {
        "url": url,
        "dbtable": sub,
        "fetchsize": str(fetchsize),
    }
    if partition_col is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC read needs lower_bound and upper_bound "
                f"for {partition_col!r}"
            )
        opts.update(
            partitionColumn=partition_col,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc_incremental(
    spark: SparkSession,
    url: str,
    table: str,
    watermark: str,
    watermark_expr: str = "coalesce(update_dt, create_dt)",
    partition_col: str | None = None,
    num_partitions: int = 16,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    **extra_options: str,
) -> DataFrame:
    """Reference S3 as a Spark primitive: incremental JDBC scan that
    ships only rows newer than the watermark, in parallel range
    partitions. See ``jdbc_incremental_options`` for the option
    semantics; ``extra_options`` passes through driver specifics
    (driver class, sessionInitStatement, queryTimeout, ...).
    """
    opts = jdbc_incremental_options(
        url, table, watermark, watermark_expr,
        partition_col, num_partitions, lower_bound, upper_bound,
    )
    opts.update(extra_options)
    return spark.read.format("jdbc").options(**opts).load()


_MISSING_TABLE_MARKERS = (
    "42x05",                    # Derby: table/view does not exist (SQLState)
    "42p01",                    # Postgres: undefined_table
    "42s02",                    # MySQL/ODBC: base table or view not found
    "table or view not found",  # Spark's own analysis phrasing
    "no such table",            # SQLite
)

# Derby: "Table/View 'X' does not exist."; Postgres: relation "x" does not
# exist; MySQL: "Table 'db.x' doesn't exist". The relation noun must appear
# BEFORE the phrase so 'database "x" does not exist' / 'schema ... does not
# exist' (connection-level failures) are NOT classified as first-run
# missing-table.
_MISSING_RELATION_RE = None


def _missing_relation_re():
    global _MISSING_RELATION_RE
    if _MISSING_RELATION_RE is None:
        import re

        _MISSING_RELATION_RE = re.compile(
            r"\b(?:table|view|relation)\b[^.;\n]{0,120}"
            r"(?:does not exist|doesn't exist)"
        )
    return _MISSING_RELATION_RE


def _is_missing_table_error(exc: BaseException) -> bool:
    """True iff the exception chain looks like a missing-RELATION error
    (vs. a transient connection/auth failure that must be re-raised).
    Walks the Py4J/Spark exception text, which embeds the JDBC driver's
    SQLState and message. The does-not-exist phrasing only counts when a
    relation noun (table/view/relation) precedes it, so a missing
    DATABASE or SCHEMA is never mistaken for a first-run missing table."""
    seen: list[str] = []
    e: BaseException | None = exc
    while e is not None and len(seen) < 8:
        seen.append(str(e).lower())
        e = e.__cause__ or e.__context__
    text = " ".join(seen)
    if any(marker in text for marker in _MISSING_TABLE_MARKERS):
        return True
    return _missing_relation_re().search(text) is not None


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    dedup_keys: list[str] | None = None,
    batchsize: int = 10_000,
    **extra_options: str,
) -> None:
    """Reference report sink (report.py:63: ``INSERT INTO …rep_fraud …
    SELECT``) as a Spark primitive: append a DataFrame through JDBC with
    executor-side batched inserts.

    With ``dedup_keys``, re-runs are idempotent: the existing key tuples
    are read back (key columns only — the projection pushes into the
    source query with dialect-correct identifier quoting, never
    the full table) and anti-joined away before the write, the same
    left_anti discipline as the parquet report sink. ``batchsize`` rows
    go per driver round-trip on each partition's cursor — the
    row-at-a-time ``execute`` loop of the reference is the classic
    single-cursor ingestion bottleneck; Spark's JDBC writer keeps one
    batched cursor PER PARTITION, so write parallelism scales with the
    upstream partitioning.
    """
    out = df
    if dedup_keys:
        spark = df.sparkSession
        try:
            existing = (
                spark.read.format("jdbc")
                .options(url=url, dbtable=table, **extra_options)
                .load()  # resolves the schema eagerly: fails HERE if absent
            )
        except Exception as exc:
            # Only a MISSING TABLE may fall through to the plain append
            # (first run against a fresh sink: Spark's JDBC writer
            # creates it). Any other failure — auth, network, timeout —
            # must NOT be swallowed: silently skipping the anti-join
            # and then appending would duplicate rows, defeating the
            # idempotence contract. Match the missing-relation SQLStates
            # / messages across common dialects instead of guessing.
            if not _is_missing_table_error(exc):
                raise
            existing = None
        if existing is not None:
            # select + distinct AFTER load: the JDBC reader prunes the
            # projection into the source query with dialect-correct
            # identifier quoting (a hand-built subquery broke on
            # engines with case-folding identifier rules, e.g. Derby),
            # so only the key columns cross the wire.
            #
            # Null-safe key equality (<=>): a plain equality anti-join
            # never matches NULL keys, so NULL-keyed rows would
            # re-insert on every run — exactly the silent-duplication
            # bug the dedup exists to prevent.
            keyed = existing.select(*dedup_keys).distinct()
            cond = None
            for kcol in dedup_keys:
                c = df[kcol].eqNullSafe(keyed[kcol])
                cond = c if cond is None else cond & c
            out = df.join(keyed, on=cond, how="left_anti")
    (
        out.write.format("jdbc")
        .options(url=url, dbtable=table, batchsize=str(batchsize), **extra_options)
        .mode("append")
        .save()
    )
