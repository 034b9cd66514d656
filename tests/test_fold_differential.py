"""Randomized differential test for the A6 net-effect overlay fold.

Hundreds of random per-key op sequences (INSERT / partial-UPDATE / DELETE
with random set-column subsets, explicit NULLs, interleaved commit order)
are folded by (a) the single-pass Spark fold, (b) the salted two-phase
fold, and (c) an independent pure-Python reference implementing the
reference connector's semantics (later record per key wins; partial UPDATE
overlays only its SET columns; DELETE tombstones; update-after-delete is a
fresh partial insert). All three must agree exactly.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logminer_kafka_connect_spark.operators.dedup import net_effect_typed

FIELDS = [
    T.StructField("url", T.StringType(), True),
    T.StructField("a", T.StringType(), True),
    T.StructField("b", T.StringType(), True),
    T.StructField("c", T.StringType(), True),
]
COLS = ["url", "a", "b", "c"]

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("commit_scn", T.LongType(), False),
        T.StructField("scn", T.LongType(), False),
        T.StructField("row_id", T.StringType(), False),
        T.StructField("op_code", T.IntegerType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField(
            "img",
            T.StructType([T.StructField(c, T.StringType(), True) for c in COLS]),
            True,
        ),
        T.StructField("set_cols", T.ArrayType(T.StringType()), True),
    ]
)


def _random_events(seed: int, n_keys: int = 40, max_ops: int = 12):
    rng = random.Random(seed)
    rows = []
    scn = 1000
    for k in range(n_keys):
        key = f"k{k}"
        for j in range(rng.randint(1, max_ops)):
            scn += rng.randint(1, 3)
            op = rng.choices([1, 3, 2], weights=[3, 5, 2])[0]
            if op == 1:  # INSERT: full image, set_cols null
                img = {c: (None if rng.random() < 0.2 else f"{c}{scn}") for c in COLS}
                img["url"] = key
                rows.append((scn + 500, scn, f"r{scn}", 1, key, tuple(img[c] for c in COLS), None))
            elif op == 3:  # UPDATE: random subset of set columns
                subset = rng.sample(["a", "b", "c"], rng.randint(1, 3))
                img = {c: None for c in COLS}
                for c in subset:
                    img[c] = None if rng.random() < 0.3 else f"{c}u{scn}"  # explicit NULLs too
                rows.append(
                    (scn + 500, scn, f"r{scn}", 3, key, tuple(img[c] for c in COLS), subset)
                )
            else:  # DELETE
                rows.append((scn + 500, scn, f"r{scn}", 2, key, None, None))
    return rows


def _python_reference(rows):
    """Independent fold: dict-state machine per key in apply order."""
    state: dict[str, dict | None] = {}
    for commit_scn, scn, row_id, op, key, img, set_cols in sorted(
        rows, key=lambda r: (r[0], r[1], r[2])
    ):
        if op == 1:
            state[key] = dict(zip(COLS, img))
        elif op == 2:
            state[key] = None  # tombstone
        else:
            cur = state.get(key)
            vals = dict(zip(COLS, img))
            if cur is None or key not in state:
                # update after delete / on missing key: fresh partial image
                row = {c: None for c in COLS}
                for c in set_cols:
                    row[c] = vals[c]
                state[key] = row
            else:
                for c in set_cols:
                    cur[c] = vals[c]
    out = {}
    for key, row in state.items():
        out[key] = None if row is None else tuple(row[c] for c in COLS)
    return out


def _spark_fold(spark, rows, salt_chunks=None, bounds=None):
    df = spark.createDataFrame(rows, PARSED_SCHEMA)
    net = net_effect_typed(
        df, FIELDS, key_col="url", salt_chunks=salt_chunks, scn_bounds=bounds
    )
    out = {}
    for r in net.collect():
        n = r["__net"]
        out[r["url"]] = None if n["deleted"] else tuple(n["img"][c] for c in COLS)
    return out


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_fold_matches_python_reference(spark, seed):
    rows = _random_events(seed)
    expected = _python_reference(rows)
    got = _spark_fold(spark, rows)
    # keys deleted net-net: Spark emits deleted=True rows; reference None
    assert got == expected


@pytest.mark.parametrize("seed", [7, 21])
def test_salted_fold_matches_python_reference(spark, seed):
    rows = _random_events(seed)
    lo = min(r[0] for r in rows)
    hi = max(r[0] for r in rows) + 1
    expected = _python_reference(rows)
    got = _spark_fold(spark, rows, salt_chunks=5, bounds=(lo, hi))
    assert got == expected
