"""Change-event row schema — the V$LOGMNR_CONTENTS shape (S1).

Mirrors the 12 columns the reference selects (``logminer/LogminerSession.kt:
169-191``) plus the rollback flag it filters on and a generator-added ``seq``
for deterministic CSF reassembly (FIXTURES.md §2). Op codes per
``LogminerSession.kt:186-189``; operation names per
``LogminerFetcher.kt:110-116``.
"""

from __future__ import annotations

from pyspark.sql import types as T

OP_INSERT = 1
OP_DELETE = 2
OP_UPDATE = 3
OP_DDL = 5
OP_COMMIT = 7
OP_ROLLBACK = 36

OPERATION_NAMES = {
    OP_INSERT: "INSERT",
    OP_DELETE: "DELETE",
    OP_UPDATE: "UPDATE",
    OP_DDL: "DDL",
    OP_COMMIT: "COMMIT",
    OP_ROLLBACK: "ROLLBACK",
}

# Operation chars of the CDC envelope (Operation.kt:3-8, Readme.md:83-90)
ENVELOPE_OPS = {"READ": "r", "INSERT": "i", "UPDATE": "u", "DELETE": "d"}

# System users excluded from commit/rollback markers (LogminerSession.kt:187)
SYSTEM_USERS = ("UNKNOWNX", "KMINER")

# Redo statements mentioning this marker are skipped (F5,
# LogminerFetcher.kt:135-137, const LogminerSession.kt:31)
TEMPORARY_TABLE_MARKER = "temporary tables"

STATUS_UNREADABLE = 2  # F6 (LogminerSource.kt:96-115)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("scn", T.LongType(), False),
        T.StructField("commit_scn", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("op_code", T.IntegerType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField("seg_owner", T.StringType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("username", T.StringType(), True),
        T.StructField("sql_redo", T.StringType(), True),
        T.StructField("row_id", T.StringType(), False),
        T.StructField("csf", T.BooleanType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("xid", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("rollback", T.IntegerType(), False),
    ]
)

EVENT_COLUMNS = [f.name for f in EVENT_SCHEMA.fields]
