"""Predicate operators F1-F7 (SURVEY.md §2.2).

The reference pushes these into the V$LOGMNR_CONTENTS scan SQL
(``logminer/LogminerSession.kt:169-191, 268-279``); here they are plain
DataFrame filters that Catalyst pushes into the parquet scan (verify with
``.explain``: they appear under PushedFilters / as early Filter nodes, and
column pruning keeps the scan at the referenced columns only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.sources.events import (
    OP_COMMIT,
    OP_DDL,
    OP_DELETE,
    OP_INSERT,
    OP_ROLLBACK,
    OP_UPDATE,
    STATUS_UNREADABLE,
    SYSTEM_USERS,
    TEMPORARY_TABLE_MARKER,
)

TableSelector = tuple[str, str | None]  # (owner, table) — table None = whole schema


def selector_predicate(selectors: list[TableSelector]) -> Column:
    """F4 — ``(SEG_OWNER='X' AND TABLE_NAME='Y') OR (SEG_OWNER='Z')`` built
    from the whitelist (``LogminerSession.kt:268-279``,
    ``SourceConnectorConfig.kt:86-97``)."""
    pred = F.lit(False)
    for owner, table in selectors:
        p = F.col("seg_owner") == owner
        if table is not None:
            p = p & (F.col("table_name") == table)
        pred = pred | p
    return pred


def filter_changes(events: DataFrame, selectors: list[TableSelector]) -> DataFrame:
    """F1 rollback-flag, F2 op-code dispatch (change side), F4 selectors,
    F5 temporary-table skip, F6 STATUS=2 skip."""
    return events.filter(
        (F.col("rollback") == 0)  # F1 (LogminerSession.kt:185)
        & F.col("op_code").isin(OP_INSERT, OP_DELETE, OP_UPDATE)  # F2 (:186-190)
        & selector_predicate(selectors)  # F4
        & ~F.coalesce(F.col("sql_redo").contains(TEMPORARY_TABLE_MARKER), F.lit(False))  # F5
        & (F.col("status") != STATUS_UNREADABLE)  # F6 (LogminerSource.kt:96-115)
    )


def marker_predicate() -> Column:
    """F2 (marker side) + F3 system-user filter on commit/rollback rows.
    The reference applies ``WHERE ROLLBACK = 0`` to the *whole* scan
    including the marker branch (``LogminerSession.kt:185-187``) — a marker
    row carrying rollback=1 must not be honored as a txn terminator."""
    return (
        F.col("op_code").isin(OP_COMMIT, OP_ROLLBACK)
        & (F.col("rollback") == 0)  # F1 applies to markers too
        & ~F.coalesce(F.col("username").isin(*SYSTEM_USERS), F.lit(False))  # F3
    )


def filter_markers(events: DataFrame) -> DataFrame:
    return events.filter(marker_predicate())


def ddl_predicate(selectors: list[TableSelector]) -> Column:
    """DDL events for monitored tables (T9). DDL auto-commits: its
    commit_scn is its own scn."""
    return (
        (F.col("op_code") == OP_DDL)
        & (F.col("status") != STATUS_UNREADABLE)
        & selector_predicate(selectors)
    )


def filter_ddl(events: DataFrame, selectors: list[TableSelector]) -> DataFrame:
    return events.filter(ddl_predicate(selectors))


def skip_to_offset(events: DataFrame, last_scn: int, last_row_id: str | None = None) -> DataFrame:
    """F7 — resume mid-SCN. The reference's cursor dance
    (``LogminerFetcher.kt:51, 74-101``) collapses to a pure predicate under
    set semantics; with scn-sorted file layout this prunes whole files."""
    if last_row_id is None:
        return events.filter(F.col("scn") > last_scn)
    return events.filter(
        (F.col("scn") > last_scn)
        | ((F.col("scn") == last_scn) & (F.col("row_id") > last_row_id))
    )
