"""Deterministic CDC event generator + independent expected-state oracle.

The reference is tested against a live Oracle XE container
(``AbstractIntegrationTest.kt:33-36``); this sandbox has no database, so the
generator synthesizes the redo stream the connector would see — LogMiner-
shaped rows over a Common-Crawl-style ``CRAWL.PAGES`` table (input_hint
schema ``url, warc_ts, html, text, lang``) — with every behavior the
reference's integration tests exercise (FIXTURES.md §2/§7):

- multi-statement transactions, interleaved/concurrent commits
- rolled-back transactions (ROLLBACK marker, J2) and in-place rollback rows
  (``ROLLBACK=1``, F1)
- CSF-chunked statements (>4000-char redo SQL, P1 — html hex payloads
  overflow constantly, like ``LongStatementsTest.kt``)
- system-user noise transactions on other tables (F3/F4)
- unreadable STATUS=2 rows (F6) and temporary-table statements (F5)
- UPDATE-to-NULL (``issues/Issue14Test.kt``), partial-column updates (P4)
- timestamp literals in all three Oracle flavors (§1.2)
- optional DDL mid-stream: ADD COLUMN with default + RENAME COLUMN (T9)
- hot-url skew (zipf-ish hot set) for the salting/AQE path (C11)

**Determinism & parallelism-independence**: every transaction is generated
purely from ``(seed, txn_id)`` — ``events_df`` fans txn ids out with
``mapInPandas`` and produces the identical event *set* at any parallelism,
which is what makes the two-cluster-size scaling benchmark apples-to-apples.

**Independent oracle**: the generator records the *intended* operations
(typed Python values) separately from the redo SQL it prints. The expected
final table state is reduced from the intended ops in pure pandas
(``expected_final_state``) — the engine must parse the SQL and reach the
same state, so a parser bug cannot cancel itself out.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Any, Iterator
from zoneinfo import ZoneInfo

import numpy as np
import pandas as pd

from logminer_kafka_connect_spark.functions.text_extract import extract_text
from logminer_kafka_connect_spark.sources.events import (
    EVENT_COLUMNS,
    EVENT_SCHEMA,
    OP_COMMIT,
    OP_DDL,
    OP_DELETE,
    OP_INSERT,
    OP_ROLLBACK,
    OP_UPDATE,
    OPERATION_NAMES,
    STATUS_UNREADABLE,
    TEMPORARY_TABLE_MARKER,
)

SCN0 = 1_000_000
SCN_GAP = 8
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_VOCAB = (
    "spark shuffle merge lakehouse crawl parser redo commit rollback snapshot "
    "stream window bucket arrow vector batch schema column page crawler index "
    "robots sitemap anchor header footer o'brien café data query engine"
).split()
_LANGS = ["en", "de", "es", "fr", "zh"]
_TITLES = ["Home", "News &amp; Views", "Docs", "About", "Archive &lt;2024&gt;"]


def _esc(s: str) -> str:
    return s.replace("'", "''")


def _fmt_ts(dt: datetime) -> str:
    # byte-identical to strftime("%Y-%m-%d %H:%M:%S.%f") for the generator's
    # year range, ~5x faster at event-generation call volume
    return (
        f"{dt.year}-{dt.month:02d}-{dt.day:02d} "
        f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}.{dt.microsecond:06d}"
    )


@dataclass
class GeneratorConfig:
    seed: int = 42
    n_txns: int = 200
    n_urls: int = 600
    n_snapshot: int = 200
    hot_urls: int = 8
    hot_frac: float = 0.25
    avg_changes: float = 4.0
    p_rollback_txn: float = 0.06
    p_noise_txn: float = 0.05
    p_inplace_rollback: float = 0.03
    p_status2: float = 0.02
    p_temp_stmt: float = 0.02
    html_paragraphs: int = 5
    chunk_chars: int = 4000
    include_ddl: bool = False
    ddl_default: int = 200
    owner: str = "CRAWL"
    table: str = "PAGES"
    base_columns: tuple = ("URL", "WARC_TS", "HTML", "LANG")
    # fraction of txns that hit a second monitored table (CRAWL.LINKS,
    # schema link_id/src_url/href/anchor) — multi-table routing fixtures
    p_links_txn: float = 0.0

    @property
    def ddl_add_txn(self) -> int:
        return self.n_txns // 2

    @property
    def ddl_rename_txn(self) -> int:
        return (3 * self.n_txns) // 4

    def ddl_txn_kind(self, txn_id: int) -> str | None:
        if not self.include_ddl:
            return None
        if txn_id == self.ddl_add_txn:
            return "add"
        if txn_id == self.ddl_rename_txn:
            return "rename"
        return None

    def extra_column(self, txn_id: int) -> str | None:
        """Name of the evolved column as seen by txn ``txn_id``'s DML.

        A margin of 8 txns below the rename keeps old-name redo SQL from
        committing *after* the rename DDL (a real LogMiner race the
        reference resolves by skipping the record after a failed schema
        refresh — we avoid generating it)."""
        if not self.include_ddl or txn_id <= self.ddl_add_txn:
            return None
        if txn_id > self.ddl_rename_txn:
            return "HTTP_STATUS"
        if txn_id > self.ddl_rename_txn - 8:
            return None
        return "FETCH_STATUS"


class CdcGenerator:
    def __init__(self, config: GeneratorConfig | None = None, **kw):
        self.cfg = config or GeneratorConfig(**kw)

    # ------------------------------------------------------------ low level
    def _rng(self, *parts: Any) -> np.random.Generator:
        h = hashlib.sha256(("|".join(map(str, parts)) + f"|{self.cfg.seed}").encode()).digest()
        return np.random.default_rng(int.from_bytes(h[:8], "big"))

    def _url(self, url_id: int) -> str:
        return f"https://site{url_id % 97}.example.com/p/{url_id}"

    def _html(self, url_id: int, rev: int) -> bytes:
        rng = self._rng("html", url_id, rev)
        title = _TITLES[int(rng.integers(len(_TITLES)))]
        paras = []
        for _ in range(1 + int(rng.integers(self.cfg.html_paragraphs * 2 - 1))):
            words = rng.choice(_VOCAB, size=int(rng.integers(20, 80)))
            paras.append("<p>" + " ".join(words) + "</p>")
        script = "<script>var t=%d;</script>" % rev if rng.random() < 0.4 else ""
        style = "<style>p{margin:0}</style>" if rng.random() < 0.3 else ""
        return (
        f"<html><head><title>{title}</title>{script}{style}</head>"
            f"<body><!-- rev {rev} -->{''.join(paras)}</body></html>"
        ).encode("utf-8")

    def _pick_url_id(self, rng: np.random.Generator) -> int:
        if rng.random() < self.cfg.hot_frac:
            return int(rng.integers(self.cfg.hot_urls))
        return int(rng.integers(self.cfg.n_urls))

    def _ts_literal(self, dt: datetime, rng: np.random.Generator) -> str:
        """One of the three Oracle timestamp flavors, all denoting ``dt``."""
        flavor = rng.random()
        naive = dt.replace(tzinfo=None)
        if flavor < 0.70:
            return f"TIMESTAMP '{_fmt_ts(naive)}'"
        if flavor < 0.85:
            local = dt.astimezone(timezone(timedelta(hours=2)))
            return f"TIMESTAMP '{_fmt_ts(local.replace(tzinfo=None))} +02:00'"
        local = dt.astimezone(ZoneInfoBerlin)
        abbrev = local.strftime("%Z")
        return f"TIMESTAMP '{_fmt_ts(local.replace(tzinfo=None))} Europe/Berlin {abbrev}'"

    # --------------------------------------------------------------- sql gen
    def _qualified(self, table: str | None = None) -> str:
        return f'"{self.cfg.owner}"."{table or self.cfg.table}"'

    def _insert_sql(self, values: dict[str, str], table: str | None = None) -> str:
        cols = ",".join(f'"{c}"' for c in values)
        vals = ",".join(values.values())
        return f"insert into {self._qualified(table)}({cols}) values ({vals})"

    def _update_sql(self, sets: dict[str, str], where: dict[str, str], table: str | None = None) -> str:
        set_part = ", ".join(f'"{c}" = {v}' for c, v in sets.items())
        where_part = " and ".join(
            f'"{c}" IS NULL' if v is None else f'"{c}" = {v}' for c, v in where.items()
        )
        return f"update {self._qualified(table)} set {set_part} where {where_part}"

    def _delete_sql(self, where: dict[str, str], table: str | None = None) -> str:
        where_part = " and ".join(
            f'"{c}" IS NULL' if v is None else f'"{c}" = {v}' for c, v in where.items()
        )
        return f"delete from {self._qualified(table)} where {where_part}"

    # ----------------------------------------------------------- txn builder
    def txn_rows(self, txn_id: int) -> tuple[list[dict], list[dict]]:
        """Events + intended ops for one transaction — pure in (seed, txn_id)."""
        cfg = self.cfg
        rng = self._rng("txn", txn_id)
        start_scn = SCN0 + txn_id * SCN_GAP
        xid = f"{txn_id:012x}"
        events: list[dict] = []
        ops: list[dict] = []

        ddl_kind = cfg.ddl_txn_kind(txn_id)
        if ddl_kind is not None:
            scn = start_scn
            if ddl_kind == "add":
                sql = (
                    f'alter table {self._qualified()} add ("FETCH_STATUS" '
                    f"NUMBER(3) DEFAULT {cfg.ddl_default})"
                )
                ops.append(
                    {"kind": "ddl_add", "column": "FETCH_STATUS", "oracle_type": "NUMBER(3)",
                     "default": cfg.ddl_default, "commit_scn": scn, "scn": scn, "row_id": "DDL", "txn_id": txn_id}
                )
            else:
                sql = f'alter table {self._qualified()} rename column "FETCH_STATUS" to "HTTP_STATUS"'
                ops.append(
                    {"kind": "ddl_rename", "old": "FETCH_STATUS", "new": "HTTP_STATUS",
                     "commit_scn": scn, "scn": scn, "row_id": "DDL", "txn_id": txn_id}
                )
            events.append(self._event(scn, OP_DDL, sql, f"DDL{txn_id:09d}", xid, commit_scn=scn))
            return events, ops

        is_noise = rng.random() < cfg.p_noise_txn
        # guarded draw: with the links table off this consumes no randomness,
        # keeping single-table workloads bit-identical across versions
        is_links = (
            not is_noise and cfg.p_links_txn > 0 and rng.random() < cfg.p_links_txn
        )
        n_changes = 1 + int(rng.poisson(cfg.avg_changes - 1))
        committed = rng.random() >= cfg.p_rollback_txn
        commit_scn = start_scn + n_changes + 1 + int(rng.integers(1, 5 * SCN_GAP))

        if is_links:
            return self._links_txn(txn_id, rng, start_scn, xid, n_changes, committed, commit_scn)

        if is_noise:
            # F3/F4 noise: system user, non-monitored table.
            for j in range(n_changes):
                scn = start_scn + j
                sql = f'insert into "SYS"."OBJ$"("ID") values ({int(rng.integers(1e6))})'
                events.append(
                    self._event(scn, OP_INSERT, sql, f"NOIS{txn_id:06d}{j:03d}", xid,
                                owner="SYS", table="OBJ$", username="KMINER")
                )
            events.append(
                self._event(commit_scn, OP_COMMIT, "commit", f"NOIS{txn_id:06d}END", xid,
                            owner=None, table=None, username="KMINER", commit_scn=commit_scn)
            )
            return events, ops

        extra_col = cfg.extra_column(txn_id)
        for j in range(n_changes):
            scn = start_scn + j
            row_id = f"AAAQ{txn_id:07d}{j:03d}"
            ts = EPOCH + timedelta(seconds=scn - SCN0)

            # F1/F5/F6 noise rows inside real transactions
            noise = rng.random()
            if noise < cfg.p_inplace_rollback:
                url_id = self._pick_url_id(rng)
                sql = self._delete_sql({"URL": f"'{_esc(self._url(url_id))}'"})
                events.append(self._event(scn, OP_DELETE, sql, row_id, xid, rollback=1))
                continue
            if noise < cfg.p_inplace_rollback + cfg.p_status2:
                events.append(
                    self._event(scn, OP_UPDATE, "Unsupported Type [binary]", row_id, xid,
                                status=STATUS_UNREADABLE)
                )
                continue
            if noise < cfg.p_inplace_rollback + cfg.p_status2 + cfg.p_temp_stmt:
                url_id = self._pick_url_id(rng)
                sql = (
                    self._insert_sql({"URL": f"'{_esc(self._url(url_id))}'", "LANG": "'xx'"})
                    + f" -- {TEMPORARY_TABLE_MARKER}"
                )
                events.append(self._event(scn, OP_INSERT, sql, row_id, xid))
                continue

            url_id = self._pick_url_id(rng)
            url = self._url(url_id)
            kind = rng.random()
            if kind < 0.45:
                op = self._gen_insert(rng, txn_id, url, url_id, scn, ts, extra_col)
            elif kind < 0.85:
                op = self._gen_update(rng, txn_id, url, url_id, scn, ts, extra_col)
            else:
                op = self._gen_delete(rng, url)
            op.update(scn=scn, row_id=row_id, txn_id=txn_id, commit_scn=commit_scn)
            events.extend(self._chunked(scn, op.pop("_op_code"), op.pop("_sql"), row_id, xid, ts))
            if committed:
                ops.append(op)

        marker_op = OP_COMMIT if committed else OP_ROLLBACK
        events.append(
            self._event(commit_scn, marker_op, OPERATION_NAMES[marker_op].lower(),
                        f"AAAQ{txn_id:07d}END", xid, owner=None, table=None,
                        commit_scn=commit_scn)
        )
        return events, ops

    def _links_txn(self, txn_id, rng, start_scn, xid, n_changes, committed, commit_scn):
        """A transaction against the second monitored table (CRAWL.LINKS,
        key = LINK_ID) — interleaves with PAGES txns so multi-table routing
        is exercised under real commit ordering."""
        cfg = self.cfg
        events: list[dict] = []
        ops: list[dict] = []
        for j in range(n_changes):
            scn = start_scn + j
            row_id = f"LNKQ{txn_id:07d}{j:03d}"
            link_id = f"L{int(rng.integers(cfg.n_urls * 2))}"
            kind = rng.random()
            if kind < 0.5:
                src = self._url(int(rng.integers(cfg.n_urls)))
                href = self._url(int(rng.integers(cfg.n_urls)))
                anchor = None if rng.random() < 0.2 else f"anchor {int(rng.integers(1000))}"
                sql = self._insert_sql(
                    {
                        "LINK_ID": f"'{link_id}'",
                        "SRC_URL": f"'{_esc(src)}'",
                        "HREF": f"'{_esc(href)}'",
                        "ANCHOR": "NULL" if anchor is None else f"'{_esc(anchor)}'",
                    },
                    table="LINKS",
                )
                op_code = OP_INSERT
                op = {"table": "LINKS", "kind": "insert", "key": link_id,
                      "values": {"src_url": src, "href": href, "anchor": anchor}}
            elif kind < 0.85:
                anchor = f"anchor {int(rng.integers(1000))}"
                sql = self._update_sql(
                    {"ANCHOR": f"'{_esc(anchor)}'"},
                    {"LINK_ID": f"'{link_id}'"},
                    table="LINKS",
                )
                op_code = OP_UPDATE
                op = {"table": "LINKS", "kind": "update", "key": link_id,
                      "values": {"anchor": anchor}}
            else:
                sql = self._delete_sql({"LINK_ID": f"'{link_id}'"}, table="LINKS")
                op_code = OP_DELETE
                op = {"table": "LINKS", "kind": "delete", "key": link_id, "values": {}}
            op.update(scn=scn, row_id=row_id, txn_id=txn_id, commit_scn=commit_scn)
            events.append(self._event(scn, op_code, sql, row_id, xid, table="LINKS"))
            if committed:
                ops.append(op)
        marker_op = OP_COMMIT if committed else OP_ROLLBACK
        events.append(
            self._event(commit_scn, marker_op, OPERATION_NAMES[marker_op].lower(),
                        f"LNKQ{txn_id:07d}END", xid, owner=None, table=None,
                        commit_scn=commit_scn)
        )
        return events, ops

    def _gen_insert(self, rng, txn_id, url, url_id, scn, ts, extra_col) -> dict:
        html = self._html(url_id, scn)
        lang = _LANGS[int(rng.integers(len(_LANGS)))] if rng.random() > 0.1 else None
        values = {
            "URL": f"'{_esc(url)}'",
            "WARC_TS": self._ts_literal(ts, rng),
            "HTML": f"HEXTORAW('{html.hex()}')",
            "LANG": "NULL" if lang is None else f"'{lang}'",
        }
        op = {
            "kind": "insert", "url": url,
            "values": {"warc_ts": ts, "html": html, "lang": lang},
        }
        if extra_col is not None:
            status = int(rng.integers(1, 600))
            values[extra_col] = str(status)
            op["values"][extra_col.lower()] = status
        op["_sql"] = self._insert_sql(values)
        op["_op_code"] = OP_INSERT
        return op

    def _gen_update(self, rng, txn_id, url, url_id, scn, ts, extra_col) -> dict:
        candidates = ["HTML", "LANG", "WARC_TS"] + ([extra_col] if extra_col else [])
        k = 1 + int(rng.integers(len(candidates)))
        chosen = list(rng.choice(candidates, size=k, replace=False))
        sets: dict[str, str] = {}
        vals: dict[str, Any] = {}
        for c in chosen:
            if c == "HTML":
                html = self._html(url_id, scn)
                sets["HTML"] = f"HEXTORAW('{html.hex()}')"
                vals["html"] = html
            elif c == "LANG":
                lang = None if rng.random() < 0.3 else _LANGS[int(rng.integers(len(_LANGS)))]
                sets["LANG"] = "NULL" if lang is None else f"'{lang}'"
                vals["lang"] = lang
            elif c == "WARC_TS":
                sets["WARC_TS"] = self._ts_literal(ts, rng)
                vals["warc_ts"] = ts
            else:
                status = int(rng.integers(1, 600))
                sets[c] = str(status)
                vals[c.lower()] = status
        where = {"URL": f"'{_esc(url)}'"}
        if rng.random() < 0.3:
            where["ROWID"] = f"'AAAR{int(rng.integers(1e9)):010d}'"
        return {
            "kind": "update", "url": url, "values": vals,
            "_sql": self._update_sql(sets, where), "_op_code": OP_UPDATE,
        }

    def _gen_delete(self, rng, url) -> dict:
        where = {"URL": f"'{_esc(url)}'"}
        if rng.random() < 0.2:
            where["LANG"] = None  # IS NULL predicate in before-image
        return {"kind": "delete", "url": url, "values": {},
                "_sql": self._delete_sql(where), "_op_code": OP_DELETE}

    def _event(self, scn, op_code, sql, row_id, xid, *, owner="CRAWL", table="PAGES",
               username="CRAWLER", commit_scn=None, rollback=0, status=0,
               csf=False, seq=0) -> dict:
        if owner == "CRAWL":
            owner = self.cfg.owner
            if table == "PAGES":
                table = self.cfg.table
        return {
            "scn": scn, "commit_scn": commit_scn,
            "ts": EPOCH + timedelta(seconds=scn - SCN0),
            "op_code": op_code, "operation": OPERATION_NAMES[op_code],
            "seg_owner": owner, "table_name": table, "username": username,
            "sql_redo": sql, "row_id": row_id, "csf": csf, "seq": seq,
            "xid": xid, "status": status, "rollback": rollback,
        }

    def _chunked(self, scn, op_code, sql, row_id, xid, ts) -> list[dict]:
        """CSF chunking: >chunk_chars statements split across rows (P1)."""
        cc = self.cfg.chunk_chars
        chunks = [sql[i : i + cc] for i in range(0, len(sql), cc)] or [""]
        out = []
        for seq, chunk in enumerate(chunks):
            out.append(
                self._event(scn, op_code, chunk, row_id, xid,
                            csf=seq < len(chunks) - 1, seq=seq)
            )
        return out

    # ------------------------------------------------------------- datasets
    def events_pdf(self) -> pd.DataFrame:
        rows: list[dict] = []
        for t in range(self.cfg.n_txns):
            rows.extend(self.txn_rows(t)[0])
        return pd.DataFrame(rows, columns=EVENT_COLUMNS)

    def ops(self) -> list[dict]:
        out: list[dict] = []
        for t in range(self.cfg.n_txns):
            out.extend(self.txn_rows(t)[1])
        return out

    def events_df(self, spark, n_partitions: int | None = None):
        """Distributed generation: one txn id -> its event rows, via
        mapInPandas. Output set is independent of ``n_partitions``."""
        cfg_self = self

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows: list[dict] = []
                for t in pdf["id"]:
                    rows.extend(cfg_self.txn_rows(int(t))[0])
                if rows:
                    yield pd.DataFrame(rows, columns=EVENT_COLUMNS)

        rng_df = spark.range(self.cfg.n_txns)
        if n_partitions:
            rng_df = rng_df.repartition(n_partitions)
        return rng_df.mapInPandas(gen, EVENT_SCHEMA)

    def _snapshot_row(self, url_id: int) -> dict:
        html = self._html(url_id, 0)
        rng = self._rng("snap", url_id)
        return {
            "url": self._url(url_id),
            "warc_ts": EPOCH - timedelta(days=1) + timedelta(seconds=url_id),
            "html": html,
            "text": extract_text(html),
            "lang": _LANGS[url_id % len(_LANGS)] if rng.random() > 0.1 else None,
        }

    def snapshot_pdf(self) -> pd.DataFrame:
        """Initial table contents (pre-CDC), typed like input_hint."""
        rows = [self._snapshot_row(url_id) for url_id in range(self.cfg.n_snapshot)]
        return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    def snapshot_df(self, spark, n_partitions: int | None = None):
        """Distributed snapshot generation via ``mapInPandas`` — same row set
        as ``snapshot_pdf`` at any parallelism. ``createDataFrame(pandas)``
        ships the whole snapshot as driver task payload (measured 35 MB
        tasks at sf0.1) and OOMs the driver at 100x; this path generates
        rows executor-side from ``(seed, url_id)`` only."""
        from logminer_kafka_connect_spark.engine import PAGES_SCHEMA

        cfg_self = self

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = [cfg_self._snapshot_row(int(i)) for i in pdf["id"]]
                if rows:
                    yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

        rng_df = spark.range(self.cfg.n_snapshot)
        if n_partitions:
            rng_df = rng_df.repartition(n_partitions)
        return rng_df.mapInPandas(gen, PAGES_SCHEMA)

    # ------------------------------------------------------ expected oracle
    def expected_final_state(self, include_snapshot: bool = True) -> pd.DataFrame:
        """Pure-pandas reduction of the *intended* ops, in
        ``(commit_scn, scn, row_id)`` order — the engine's independent
        oracle (SURVEY §5). Tolerant upsert semantics: UPDATE on a missing
        key inserts the partial image; DELETE on a missing key is a no-op."""
        state: dict[str, dict[str, Any]] = {}
        columns = ["url", "warc_ts", "html", "text", "lang"]
        if include_snapshot:
            for r in self.snapshot_pdf().to_dict("records"):
                state[r["url"]] = dict(r)

        for op in sorted(self.ops(), key=lambda o: (o["commit_scn"], o["scn"], o["row_id"])):
            if op.get("table") == "LINKS":
                continue  # second table reduced by expected_links_state
            kind = op["kind"]
            if kind == "ddl_add":
                col = op["column"].lower()
                columns.append(col)
                for row in state.values():
                    row[col] = op["default"]
                continue
            if kind == "ddl_rename":
                old, new = op["old"].lower(), op["new"].lower()
                columns[columns.index(old)] = new
                for row in state.values():
                    row[new] = row.pop(old, None)
                continue
            url = op["url"]
            if kind == "delete":
                state.pop(url, None)
                continue
            vals = dict(op["values"])
            if kind == "insert" or url not in state:
                row = {c: None for c in columns}
                row["url"] = url
            else:
                row = state[url]
            for k, v in vals.items():
                row[k] = v
            if "html" in vals:
                row["text"] = extract_text(vals["html"])
            state[url] = row

        recs = [{c: row.get(c) for c in columns} for row in state.values()]
        out = pd.DataFrame(recs, columns=columns)
        return out.sort_values("url").reset_index(drop=True)

    def expected_links_state(self) -> pd.DataFrame:
        """Pure-pandas oracle for the second table (CRAWL.LINKS)."""
        state: dict[str, dict[str, Any]] = {}
        columns = ["link_id", "src_url", "href", "anchor"]
        links_ops = (o for o in self.ops() if o.get("table") == "LINKS")
        for op in sorted(links_ops, key=lambda o: (o["commit_scn"], o["scn"], o["row_id"])):
            key = op["key"]
            if op["kind"] == "delete":
                state.pop(key, None)
                continue
            if op["kind"] == "insert" or key not in state:
                row = {c: None for c in columns}
                row["link_id"] = key
            else:
                row = state[key]
            for k, v in op["values"].items():
                row[k] = v
            state[key] = row
        recs = [{c: row.get(c) for c in columns} for row in state.values()]
        return pd.DataFrame(recs, columns=columns).sort_values("link_id").reset_index(drop=True)


ZoneInfoBerlin = ZoneInfo("Europe/Berlin")
