"""As-of (point-in-time) join: enrich each left row with the most recent
prior right row for the same key.

The reference connector resolves every change event against the most
recent committed transaction state at its SCN (``LogminerSource.kt``'s
ordered consume + ``TransactionConsolidator``'s commit lookup is an
as-of resolution in disguise); analytics consumers of a CDC feed need
the same shape as a first-class operator — "state of X as of event time
T" — so it is exposed here as a general batch operator.

Scale shape (the reason this is NOT implemented as a range join):

- A naive ``left JOIN right ON key AND right.ts <= left.ts`` explodes to
  O(|left| x |right per key|) intermediate rows before the per-left-row
  max is taken. At 100 TB that intermediate is the bottleneck.
- Instead both sides are **unioned and sorted once** per key: one
  Exchange on ``key``, one per-partition sort on ``(ts, tiebreak)``,
  then a running ``last(value, ignorenulls=True)`` window carries the
  latest right-side payload forward into each left row. Cost is
  O(n log n) per key group, intermediate size is |left| + |right|, and
  Catalyst executes the whole thing JVM-side (window exec, no UDFs).
- Spark 4's native range-join hints cover the inequality-join strategy;
  the union-scan shape is still strictly smaller in shuffled bytes
  because the right side is never replicated per left row.

Determinism: rows are ordered by ``(ts_col, side, *tiebreak_cols)``
where the tiebreaks are RIGHT-side columns; callers must pass tiebreaks
that totalize the right-side ordering (an event id) or equal-timestamp
right rows would resolve arbitrarily. Left-vs-right visibility at an
equal timestamp is decided by ``strict`` alone, never by tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_L, _R = 1, 0  # left rows sort AFTER right rows at an equal sort key


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    strict: bool = False,
    tolerance: Column | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each ``left`` row, attach ``value_cols`` from the latest
    ``right`` row with the same ``on`` key and ``right.ts <= left.ts``
    (``<`` when ``strict``).

    ``tolerance``: an interval/numeric Column; matches older than
    ``left.ts - tolerance`` resolve to NULL (pandas ``merge_asof``
    semantics). Output = every left column plus ``{prefix}{ts_col}`` and
    ``{prefix}{c}`` for each value col (NULL when no prior right row).
    """
    tiebreak_cols = tiebreak_cols or []
    payload = F.struct(F.col(ts_col).alias("__ts"), *[F.col(c) for c in value_cols])
    tb_types = {c: right.schema[c].dataType for c in tiebreak_cols}

    lhs = left.select(
        *left.columns,
        F.lit(_L).alias("__side"),
        F.lit(None).cast(
            right.select(payload).schema[0].dataType
        ).alias("__payload"),
        *[
            F.lit(None).cast(tb_types[c]).alias(f"__tb_{c}")
            for c in tiebreak_cols
        ],
    )
    # Right side contributes only key/order/payload columns; everything
    # else is NULL-filled to align the union, so the single Exchange
    # ships no unused right-side columns.
    rhs = right.select(
        *[
            F.col(c).alias(c) if c in (on + [ts_col]) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(_R).alias("__side"),
        payload.alias("__payload"),
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreak_cols],
    )

    # At an equal timestamp, side decides visibility: right rows sort
    # before left rows (inclusive <=) unless strict, where left rows sort
    # first so the equal-ts right row falls outside the frame. Tiebreaks
    # (right-side columns) then make the choice among equal-ts right rows
    # deterministic: ascending order + last() picks the greatest.
    side_order = F.col("__side") if not strict else -F.col("__side")
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col),
            side_order,
            *[F.col(f"__tb_{c}") for c in tiebreak_cols],
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = F.last(F.col("__payload"), ignorenulls=True).over(w)

    out = (
        lhs.unionByName(rhs)
        .withColumn("__carried", carried)
        .filter(F.col("__side") == _L)
    )
    matched_ts = F.col("__carried.__ts")
    if tolerance is not None:
        in_range = matched_ts >= (F.col(ts_col) - tolerance)
        keep = F.when(in_range, F.col("__carried"))
    else:
        keep = F.col("__carried")
    out = out.withColumn("__keep", keep)
    return out.select(
        *left.columns,
        F.col("__keep.__ts").alias(f"{prefix}{ts_col}"),
        *[F.col(f"__keep.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
