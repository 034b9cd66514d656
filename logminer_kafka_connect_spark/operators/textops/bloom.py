"""Distributed Bloom-filter novelty check: "which incoming documents have
we definitely never seen?"

The incremental-ingest companion to the dedup suite: a CDC feed of web
pages wants to skip re-processing (re-extract, re-embed, re-dedup) for
pages whose content is already in the corpus. An exact anti-join answers
that with a full shuffle of both sides on the key; a Bloom filter of the
base corpus answers "definitely novel" with **zero shuffle of the delta**
— the classic time/space trade: no false negatives (a truly-new document
is never mislabeled seen), a bounded false-positive rate (a few novel
documents take the slow exact path).

Scale shape:

- Hashing is JVM-side (``md5`` + ``conv``, same double-hashing scheme as
  the MinHash suite) — Python only ORs/tests precomputed bit positions
  in vectorized numpy over Arrow batches.
- Build: each partition folds its keys into one local bitmap
  (``mapInPandas``, one output row per partition). With few partitions
  the partials are OR-merged at the driver (bounded: n_partitions x
  n_bits/8 bytes); past ``TREE_MERGE_THRESHOLD`` partitions a tree
  level runs first — partials repartition into G groups and OR
  executor-side, so the driver always collects at most G bitmaps no
  matter how wide the scan was (the 1000-executor case).
- Check: the finished bitmap is a **broadcast variable** (one copy per
  executor, not per task); the delta stream maps through it narrowly.

Sizing: k = n_hashes, m = n_bits, n keys -> FP ~ (1 - e^{-kn/m})^k.
The defaults (m = 2^23, k = 4) hold FP < 0.25% out to ~1M keys; size m
to the corpus (Spark's own ``BloomFilter`` sizing math applies).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MASKS = np.left_shift(np.uint8(1), np.arange(8, dtype=np.uint8))


@dataclass(frozen=True)
class BloomFilter:
    """Immutable built filter; ``bits`` is a packed uint8 bitmap."""

    bits: np.ndarray
    n_bits: int
    n_hashes: int

    def might_contain_positions(self, v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
        """Vectorized membership test from the two hash lanes."""
        seen = np.ones(len(v1), dtype=bool)
        for i in range(self.n_hashes):
            pos = (v1 + i * v2) % self.n_bits
            seen &= (self.bits[pos >> 3] & _MASKS[pos & 7]) != 0
        return seen


def _hash_lanes(df: DataFrame, key_col: str) -> DataFrame:
    """Two independent 60-bit lanes from one JVM-side md5 of the key
    (15 hex chars each stays far under 2^63 — no signed overflow in
    ``conv``, and numpy int64 arithmetic matches exactly)."""
    h = F.md5(F.col(key_col).cast("string"))
    return df.withColumn("__v1", F.conv(F.substring(h, 1, 15), 16, 10).cast("long")) \
             .withColumn("__v2", F.conv(F.substring(h, 17, 15), 16, 10).cast("long"))


#: above this many scan partitions, insert an executor-side OR level so
#: the driver never collects more than TREE_MERGE_GROUPS bitmaps
TREE_MERGE_THRESHOLD = 64
TREE_MERGE_GROUPS = 8


def build_bloom(
    df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
) -> BloomFilter:
    """Fold every ``key_col`` value into a Bloom filter: one bitmap per
    partition (numpy, inside mapInPandas), OR-merged executor-side past
    TREE_MERGE_THRESHOLD partitions, then at the driver."""
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    lanes = _hash_lanes(df.select(key_col), key_col).select("__v1", "__v2")

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        saw = False
        for b in batches:
            saw = True
            v1 = b["__v1"].to_numpy(dtype=np.int64)
            v2 = b["__v2"].to_numpy(dtype=np.int64)
            for i in range(n_hashes):
                pos = (v1 + i * v2) % n_bits
                np.bitwise_or.at(bits, pos >> 3, _MASKS[pos & 7])
        if saw:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    def or_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for b in batches:
            for raw in b["bitmap"]:
                m = np.frombuffer(raw, dtype=np.uint8)
                acc = m.copy() if acc is None else (acc | m)
        if acc is not None:
            yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    partials_df = lanes.mapInPandas(fold, schema="bitmap binary")
    if lanes.rdd.getNumPartitions() > TREE_MERGE_THRESHOLD:
        partials_df = partials_df.repartition(TREE_MERGE_GROUPS).mapInPandas(
            or_fold, schema="bitmap binary"
        )
    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in partials_df.collect():
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return BloomFilter(bits=merged, n_bits=n_bits, n_hashes=n_hashes)


def novelty_flags(
    df: DataFrame,
    bloom: BloomFilter,
    key_col: str,
    flag_col: str = "possibly_seen",
) -> DataFrame:
    """Tag each row: ``possibly_seen`` = every hash bit set in the base
    filter (false positives possible, false negatives impossible — rows
    with the flag False are DEFINITELY novel). Narrow plan: broadcast
    bitmap, zero shuffle."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((bloom.bits, bloom.n_bits, bloom.n_hashes))

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits, n_bits, n_hashes = bc.value
        bf = BloomFilter(bits=bits, n_bits=n_bits, n_hashes=n_hashes)
        for b in batches:
            v1 = b["__v1"].to_numpy(dtype=np.int64)
            v2 = b["__v2"].to_numpy(dtype=np.int64)
            out = b.drop(columns=["__v1", "__v2"])
            out[flag_col] = bf.might_contain_positions(v1, v2)
            yield out

    lanes = _hash_lanes(df, key_col)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {flag_col} boolean"
    return lanes.mapInPandas(check, schema=schema)


BLOOM_MAGIC = b"LMKCBLM1"


def save_bloom(bloom: BloomFilter, path: str) -> None:
    """Persist a built filter (8-byte magic, two little-endian uint64
    header words, raw bitmap). The standing-corpus filter is built once
    per maintenance cycle and re-broadcast by every ingest batch —
    persisting it is what makes the novelty screen *incremental* across
    driver restarts instead of a per-run rebuild."""
    header = np.array([bloom.n_bits, bloom.n_hashes], dtype="<u8").tobytes()
    with open(path, "wb") as f:
        f.write(BLOOM_MAGIC + header + bloom.bits.tobytes())


def load_bloom(path: str) -> BloomFilter:
    with open(path, "rb") as f:
        raw = f.read()
    if raw[: len(BLOOM_MAGIC)] != BLOOM_MAGIC:
        raise ValueError(f"not a bloom filter file: {path}")
    n_bits, n_hashes = np.frombuffer(raw, dtype="<u8", count=2, offset=len(BLOOM_MAGIC))
    bits = np.frombuffer(raw, dtype=np.uint8, offset=len(BLOOM_MAGIC) + 16).copy()
    if len(bits) != n_bits // 8:
        raise ValueError(f"truncated bloom filter file: {path}")
    return BloomFilter(bits=bits, n_bits=int(n_bits), n_hashes=int(n_hashes))
