"""Range (interval) join: match each left point to every right interval
containing it, as an equi-join Catalyst can actually optimize.

Spark has no native interval-join strategy for ``l.p >= r.lo AND
l.p < r.hi`` — the naive spelling plans as BroadcastNestedLoopJoin (or a
cartesian product when the right side is large): every left row tests
every interval, O(|L| x |R|), the classic 100-TB scale killer.

This operator rewrites the inequality as an **equi-join on grid cells**:
intervals are exploded onto the fixed-width cells they overlap, points
map to exactly one cell, the join is a plain hash join on the cell id
(broadcast when the interval side is small, shuffle otherwise), and the
exact containment predicate filters the cell-collision false positives.
Each (point, interval) match survives in exactly one cell — the point's
own — so no dedup pass is needed.

Cost model: |R| inflates by avg(interval width / cell) rows; |L| is
unchanged. Pick ``cell`` near the median interval width — smaller cells
inflate the interval side, larger cells admit more false positives into
the post-filter. Both failure modes degrade gracefully (correctness
never depends on the cell size).

Reference analog: the log-file SCN-range lookup (J3,
``LogminerSource.kt``'s file-for-SCN resolution) is this join with the
file list as the interval side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CELL = "__cell"


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    cell: float,
    extra_on: list[str] | None = None,
    broadcast_right: bool = True,
) -> DataFrame:
    """Join ``left`` rows to ``right`` intervals with
    ``right.lo <= left.point < right.hi`` (half-open, the unambiguous
    convention for contiguous bands). Inner semantics: a point in no
    interval drops, a point in k overlapping intervals emits k rows
    (left-outer over intervals needs a unique left key to dedup cell
    false-positives and is deliberately not offered).

    ``extra_on``: additional equi-join key columns (both sides).
    Output: every left column + every right column except the cell id.
    """
    if cell <= 0:
        raise ValueError(f"cell must be positive, got {cell}")
    extra_on = extra_on or []

    def cell_of(c: Column) -> Column:
        return F.floor(c / F.lit(cell)).cast("long")

    # hi is exclusive: an interval [lo, hi) overlaps cells
    # floor(lo/cell) .. floor((hi - epsilon)/cell); using ceil(hi/cell)-1
    # avoids needing an epsilon and is exact for hi on a cell boundary
    last_cell = (F.ceil(F.col(hi_col) / F.lit(cell)) - 1).cast("long")
    rhs = right.withColumn(
        _CELL,
        F.explode(F.sequence(cell_of(F.col(lo_col)), F.greatest(last_cell, cell_of(F.col(lo_col))))),
    )
    if broadcast_right:
        rhs = F.broadcast(rhs)
    lhs = left.withColumn(_CELL, cell_of(F.col(point_col)))

    contains = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    on = [_CELL, *extra_on]
    return lhs.join(rhs, on=on, how="inner").filter(contains).drop(_CELL)
