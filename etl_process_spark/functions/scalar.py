"""Scalar Column helpers (reference SURVEY §2.8, F1–F11).

Each helper cites the reference idiom it re-expresses. All stay inside
Catalyst/whole-stage codegen: no Python UDFs.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel values (reference py_scripts/terminals.py:15-16, main.ddl:139-145).
INFINITY_DATE = "9999-12-31"
INFINITY_TS = "9999-12-31 00:00:00"
WATERMARK_EPOCH = "1900-01-01"


def euro_decimal(col: Column | str, precision: int = 15, scale: int = 2) -> Column:
    """European decimal string -> decimal: ``"1.234,56"`` -> ``1234.56``.

    Reference: ``replace(replace(amount,'.',''),',','.')`` then implicit cast
    (py_scripts/transaction.py:77). '.' is a thousands separator, ',' the
    decimal point.
    """
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.regexp_replace(c, r"\.", ""), ",", ".")
    return normalized.cast(f"decimal({precision},{scale})")


def fio(last: Column | str, first: Column | str, patronymic: Column | str) -> Column:
    """Full-name assembly, EXACT Postgres ``concat`` semantics.

    Reference: Postgres ``concat(last_name,' ',first_name,' ',patronymic)``
    (py_scripts/report.py:23) treats a NULL argument as '' but KEEPS the
    literal space arguments — a NULL patronymic yields ``'Ivanov Ivan '``
    with a trailing space, not ``'Ivanov Ivan'``. Spark's ``concat``
    returns NULL on any NULL input and ``concat_ws`` drops the separator
    next to a NULL (the rounds-1..3 behavior, off by the trailing
    space), so exact parity is ``concat`` over coalesced parts with the
    spaces as ordinary arguments.
    """
    return F.concat(
        F.coalesce(F.col(last) if isinstance(last, str) else last, F.lit("")),
        F.lit(" "),
        F.coalesce(F.col(first) if isinstance(first, str) else first, F.lit("")),
        F.lit(" "),
        F.coalesce(
            F.col(patronymic) if isinstance(patronymic, str) else patronymic,
            F.lit(""),
        ),
    )


def changed_any(left_prefix: str, right_prefix: str, cols: Iterable[str]) -> Column:
    """Null-safe ANY-tracked-column-changed predicate (SCD2 change detect).

    Reference hand-rolls, per column, the 3-clause idiom
    ``a<>b OR (a IS NULL AND b IS NOT NULL) OR (a IS NOT NULL AND b IS NULL)``
    (py_scripts/terminals.py:128-131, clients.py:156-163). Spark's
    null-safe equality ``<=>`` collapses each to one operator:
    ``NOT (a <=> b)``, OR-ed over the tracked columns.
    """
    pred = F.lit(False)
    for c in cols:
        pred = pred | ~F.col(f"{left_prefix}.{c}").eqNullSafe(F.col(f"{right_prefix}.{c}"))
    return pred


def trim_eq(left: Column | str, right: Column | str) -> Column:
    """Join-key equality on trimmed strings.

    Reference: ``ON trim(tr.card_num) = trim(c.card_num)``
    (py_scripts/report.py:43) — card/passport numbers are space-padded
    fixed-width varchars.
    """
    lc = F.col(left) if isinstance(left, str) else left
    rc = F.col(right) if isinstance(right, str) else right
    return F.trim(lc) == F.trim(rc)


def minus_seconds(ts: Column | str, seconds: int = 1) -> Column:
    """``ts - INTERVAL n SECOND`` — the SCD2 version-close timestamp.

    Reference: ``update_dt - interval '1 second'``
    (py_scripts/terminals.py:134, cards.py:126).
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return c - F.expr(f"INTERVAL {int(seconds)} SECOND")


def seconds_between(later: Column | str, earlier: Column | str) -> Column:
    """Timestamp difference in whole seconds (bigint).

    Reference compares interval differences to literal intervals
    (``lag_pr_date <= interval '1 hour'``, py_scripts/report.py:99);
    second-granularity longs are the codegen-friendly equivalent.
    """
    lc = F.col(later) if isinstance(later, str) else later
    ec = F.col(earlier) if isinstance(earlier, str) else earlier
    return lc.cast("long") - ec.cast("long")
