"""Transaction consolidation — J1/J2/A1/T2/P1 (SURVEY.md §2.4, §2.10).

The reference buffers changes per xid in a heap/disk map and releases them
on COMMIT (``logminer/TransactionConsolidator.kt:25-102``,
``Transaction.kt``). The Spark-native design keeps **no operator state**:
the event log itself is the state. Each microbatch is a *commit-SCN range*;
member changes of the committing transactions are (re-)scanned from the
log, so an uncommitted transaction's rows simply stay in place until the
batch whose range contains their COMMIT (T2 hold-back). This mirrors the
reference's resume-from-``lowestChangeScn`` re-read
(``logminer/LogminerFetcher.kt:32-41``) instead of translating the buffer.

Scale notes (100 TB): changes join markers on ``xid`` — both sides come
pre-filtered by pushed predicates; the marker side of a batch is usually
tiny relative to changes, so it is broadcast — but only below a
size threshold (``BROADCAST_MARKER_LIMIT``): a bulk replay whose single
"batch" commits hundreds of millions of transactions must fall back to a
shuffled equi-join (AQE picks the physical strategy) instead of building
an executor-crushing broadcast map. The caller passes the marker count
(known driver-side from ``plan_ranges``'s one aggregation) as
``marker_count_hint``. The change re-scan is bounded
below by the carryover watermark (A1) and above by the batch's commit-SCN
ceiling; with the event log laid out scn-sorted/partitioned both bounds
prune files (the analog of the reference mining only logs whose
``[FIRST_CHANGE#, NEXT_CHANGE#)`` overlaps, ``LogminerSession.kt:62-74``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.filters import (
    TableSelector,
    filter_changes,
    filter_markers,
)
from logminer_kafka_connect_spark.sources.events import OP_COMMIT, OP_ROLLBACK

# Broadcast the commit/rollback marker sets only below this many markers
# (~1M xids ≈ a ~100 MB hashed relation — the safe ceiling for a broadcast
# build; above it the join shuffles and AQE chooses the strategy).
BROADCAST_MARKER_LIMIT = 1_000_000


def reassemble_csf(changes: DataFrame) -> DataFrame:
    """P1 — CSF continuation reassembly (``LogminerFetcher.kt:144-153``).

    Chunks of one statement share ``(xid, scn, row_id)`` and are ordered by
    ``seq``; concatenate with an order-stable aggregation (map-side partial
    aggregation applies; no window needed). Single-chunk rows (the vast
    majority) pass through the same group-by, which AQE keeps cheap.
    """
    meta_cols = [
        "commit_scn", "ts", "op_code", "operation",
        "seg_owner", "table_name", "username",
    ]
    # Single-chunk statements (csf=false, seq=0 — the vast majority) carry
    # their full SQL already and BYPASS the reassembly exchange entirely;
    # only continuation groups shuffle. The union keeps one schema.
    single = changes.filter(~F.col("csf") & (F.col("seq") == 0)).select(
        "xid", "scn", "row_id", *meta_cols, "sql_redo"
    )
    chunked = changes.filter(F.col("csf") | (F.col("seq") > 0))

    parts = F.array_sort(F.collect_list(F.struct("seq", "sql_redo")))
    sql = F.concat_ws("", F.expr("transform(__parts, p -> p.sql_redo)"))
    reassembled = (
        chunked.groupBy("xid", "scn", "row_id")
        .agg(
            parts.alias("__parts"),
            *[F.first(c).alias(c) for c in meta_cols],
        )
        .withColumn("sql_redo", sql)
        .drop("__parts")
        .select("xid", "scn", "row_id", *meta_cols, "sql_redo")
    )
    out = single.unionByName(reassembled)
    return out.withColumn("commit_scn_raw", F.col("commit_scn")).drop("commit_scn")


def consolidate(
    events: DataFrame,
    selectors: list[TableSelector],
    commit_lo: int | None = None,
    commit_hi: int | None = None,
    change_lo: int | None = None,
    marker_count_hint: int | None = None,
    reassemble: bool = True,
) -> DataFrame:
    """Changes of transactions *committed* in ``[commit_lo, commit_hi)``,
    reassembled, stamped with their ``commit_scn`` (J1), rollbacks excluded
    (J2). Returns one row per change with
    ``(xid, scn, row_id, commit_scn, op_code, operation, sql_redo, ...)``.
    """
    markers = filter_markers(events)
    if commit_lo is not None:
        markers = markers.filter(F.col("scn") >= commit_lo)
    if commit_hi is not None:
        markers = markers.filter(F.col("scn") < commit_hi)
    return consolidate_with_markers(
        events, selectors, markers, commit_hi, change_lo, marker_count_hint,
        reassemble=reassemble,
    )


def consolidate_with_markers(
    events: DataFrame,
    selectors: list[TableSelector],
    markers: DataFrame,
    commit_hi: int | None = None,
    change_lo: int | None = None,
    marker_count_hint: int | None = None,
    reassemble: bool = True,
) -> DataFrame:
    """Consolidate against an explicit marker set (streaming front-end:
    each trigger applies exactly the markers it delivered — exactly-once
    per marker via the file-source WAL — rather than an SCN range).

    ``marker_count_hint``: the (estimated) number of marker rows. Below
    ``BROADCAST_MARKER_LIMIT`` (or when None — bounded-microbatch contract)
    the commit/rollback sets are broadcast; at or above it the join
    shuffles on ``xid`` and AQE picks the physical strategy (a 10^8-txn
    bulk batch must not build a broadcast map)."""
    commits = (
        markers.filter(F.col("op_code") == OP_COMMIT)
        .select("xid", F.col("scn").alias("commit_scn"))
        .dropDuplicates(["xid"])
    )
    rollbacks = markers.filter(F.col("op_code") == OP_ROLLBACK).select("xid").distinct()

    changes = filter_changes(events, selectors)
    if commit_hi is not None:
        # a change always precedes its commit marker
        changes = changes.filter(F.col("scn") < commit_hi)
    if change_lo is not None:
        # T2 carryover bound: every change below the previous batch's
        # open-txn watermark belongs to an already-applied commit — the
        # re-scan is pruned to [watermark, commit_hi), exactly the
        # reference's resume-from-lowestChangeScn (LogminerFetcher.kt:32-41)
        changes = changes.filter(F.col("scn") >= change_lo)
    if reassemble:
        changes = reassemble_csf(changes).drop("commit_scn_raw")
    else:
        # Fused-parse mode (operators.apply.parse_committed_typed
        # raw_chunks=True): keep the chunk-level rows — reassembly happens
        # inside the parse's own mapInPandas pass, so the chunked
        # statements' text never crosses a reassembly Exchange. The
        # broadcast marker joins below preserve partition-local row order
        # (streaming probe side), which the fused pass relies on; the
        # change-carried commit_scn column (null pre-commit) is dropped
        # here exactly as reassemble_csf drops it, so the join's marker
        # commit_scn is the one that survives.
        changes = changes.drop("commit_scn")

    # J1: equi-join to the committed-xid set — broadcast the marker side
    # when it is genuinely small (bounded by txns committing in this batch,
    # usually orders of magnitude smaller than the change set). J2:
    # anti-join rolled-back xids (TransactionConsolidator.kt:42-45).
    small = marker_count_hint is None or marker_count_hint < BROADCAST_MARKER_LIMIT
    if small:
        commits, rollbacks = F.broadcast(commits), F.broadcast(rollbacks)
    out = changes.join(commits, "xid", "inner")
    out = out.join(rollbacks, "xid", "left_anti")
    return out


def open_txn_watermark(
    events: DataFrame,
    selectors: list[TableSelector],
    commit_hi: int,
    change_lo: int | None = None,
) -> tuple[int | None, int]:
    """A1 — the safe resume point: ``min(scn)`` over changes whose
    transaction has no marker below ``commit_hi``
    (``TransactionConsolidator.kt:57-62, 113-115``). Returns
    ``(min_open_scn_or_None, n_open_changes)``; the next batch re-scans
    changes from this bound (T2 carryover).

    ``change_lo`` (the previous batch's watermark) bounds the scan below:
    a change under the previous watermark belongs to a transaction that
    already had a marker below the previous ``commit_hi`` — markers only
    accumulate, so it cannot be open now. Without this bound the watermark
    job rescans the log from SCN 0 every batch, which is quadratic in log
    length over a long replay (a genuine 10^10-event scale-killer). A
    transaction's marker always follows its changes, so the marker scan is
    bounded by the same floor.
    """
    markers = filter_markers(events).filter(F.col("scn") < commit_hi)
    changes = filter_changes(events, selectors).filter(F.col("scn") < commit_hi)
    if change_lo is not None:
        markers = markers.filter(F.col("scn") >= change_lo)
        changes = changes.filter(F.col("scn") >= change_lo)
    open_changes = changes.join(markers.select("xid").distinct(), "xid", "left_anti")
    row = open_changes.agg(
        F.min("scn").alias("lo"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return row["lo"], row["n"]
