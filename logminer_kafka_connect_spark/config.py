"""Reference-compatible connector configuration (drop-in `.properties` surface).

The reference is configured through Kafka Connect properties
(``SourceConnectorConfig.kt:118-250``: 16 keys, typed, with defaults and
required-key validation via ``ConfigDef``). A user switching from the
reference to this engine should be able to bring that properties map
unchanged. This module accepts exactly those keys with the same types,
defaults, and required-ness, and maps each onto this engine's knobs:

==========================  ====================================================
property                    mapping here
==========================  ====================================================
``db.name``                 logical name -> topic prefix for envelope records
                            (``SourceDatabaseNameService.kt:20-27``) and the
                            offset-partition identity (``SourceTask.kt:41``);
                            exposed via :meth:`SourceConnectorConfig.topic_name`
                            and the ``db_name=`` argument of
                            ``operators.envelope.to_envelope``.
``table.whitelist``         ``OWNER.TABLE`` / ``OWNER`` entries ->
                            ``operators.filters`` selector list
                            (:meth:`SourceConnectorConfig.selectors`).
``start.scn``               0 -> initial snapshot then CDC (``SourceTask.kt:81-86``
                            ``createOffsetFromConfig``); >0 -> skip the snapshot
                            and replay from that SCN
                            (:attr:`SourceConnectorConfig.needs_initial_snapshot`,
                            passed as ``replay(start_scn=...)``).
``tombstones.on.delete``    ``to_envelope(tombstones=...)``.
``batch.size``              rows per poll batch in the reference; here the
                            micro-batch sizing hint —
                            :meth:`SourceConnectorConfig.n_batches` converts an
                            event-count estimate into the ``replay(n_batches=)``
                            argument so each commit-SCN batch carries ~batch.size
                            change rows.
``db.timezone``             session timezone for naive TIMESTAMP decoding ->
                            ``spark.sql.session.timeZone``
                            (:meth:`SourceConnectorConfig.apply_session_timezone`).
``poll.interval.ms``        idle wait between polls -> Structured Streaming
                            ``processingTime`` trigger interval
                            (:attr:`SourceConnectorConfig.poll_interval_ms`).
``db.fetch.size``           JDBC prefetch hint (O5). No JDBC here; accepted,
                            defaulted to ``batch.size`` like the reference, and
                            surfaced for parity (``SourceConnectorConfig.kt:103-105``).
``db.logminer.dictionary``  ONLINE | REDO_LOG (validated enum). Dictionary
                            strategy is a server-side concern in the reference;
                            here schema resolution is the pluggable
                            ``schema_provider`` — the key is validated and
                            surfaced.
``db.sid`` ``db.hostname``  JDBC endpoint + retry policy
``db.port`` ``db.user``     (``SourceConnectorConfig.kt:31-58``). This engine
``db.user.password``        reads redo-log extracts from files, not a live JDBC
``db.attempts``             session, so these carry no behavior — but they are
``db.backoff.ms``           REQUIRED/validated exactly like the reference so an
                            existing properties file passes validation unchanged,
                            and surfaced via ``connection_info()``.
==========================  ====================================================

Unknown keys are collected in ``unused`` (Kafka ``AbstractConfig`` logs-and-
ignores unknowns; failing on them would reject real-world property files
that carry ``connector.class``, ``name``, converter settings, etc.).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Mapping

from logminer_kafka_connect_spark.functions.naming import TableId, sanitize_name

LOGMINER_DICTIONARY_SOURCES = ("ONLINE", "REDO_LOG")

# Keys (SourceConnectorConfig.kt companion object, :118-133).
DB_NAME = "db.name"
DB_SID = "db.sid"
DB_HOST = "db.hostname"
DB_PORT = "db.port"
DB_USERNAME = "db.user"
DB_PASSWORD = "db.user.password"
DB_ATTEMPTS = "db.attempts"
DB_BACKOFF_MS = "db.backoff.ms"
DB_LOGMINER_DICTIONARY = "db.logminer.dictionary"
DB_TIMEZONE = "db.timezone"
MONITORED_TABLES = "table.whitelist"
DB_FETCH_SIZE = "db.fetch.size"
START_SCN = "start.scn"
BATCH_SIZE = "batch.size"
POLL_INTERVAL_MS = "poll.interval.ms"
TOMBSTONES_ON_DELETE = "tombstones.on.delete"

_REQUIRED = object()  # sentinel: no default -> key must be present


@dataclass(frozen=True)
class _Def:
    type: str  # STRING | INT | LONG | BOOLEAN
    default: object  # _REQUIRED, None (nullable), or a concrete value


# Mirrors ConfigDef.define(...) calls (SourceConnectorConfig.kt:135-250):
# same required set, same defaults, same types.
CONFIG_DEFS: dict[str, _Def] = {
    DB_NAME: _Def("STRING", _REQUIRED),
    DB_SID: _Def("STRING", _REQUIRED),
    DB_HOST: _Def("STRING", _REQUIRED),
    DB_PORT: _Def("INT", _REQUIRED),
    DB_USERNAME: _Def("STRING", _REQUIRED),
    DB_PASSWORD: _Def("STRING", _REQUIRED),
    DB_LOGMINER_DICTIONARY: _Def("STRING", "ONLINE"),
    DB_TIMEZONE: _Def("STRING", "UTC"),
    MONITORED_TABLES: _Def("STRING", ""),
    TOMBSTONES_ON_DELETE: _Def("BOOLEAN", True),
    BATCH_SIZE: _Def("INT", 1000),
    DB_FETCH_SIZE: _Def("INT", None),  # nullable -> defaults to batch.size
    START_SCN: _Def("LONG", 0),
    DB_ATTEMPTS: _Def("INT", 3),
    DB_BACKOFF_MS: _Def("LONG", 10000),
    POLL_INTERVAL_MS: _Def("LONG", 2000),
}


class ConfigError(ValueError):
    """Invalid/missing connector property (ConfigDef validation analog)."""


def _parse_value(key: str, d: _Def, raw: object) -> object:
    """Kafka AbstractConfig semantics: properties arrive as strings; typed
    values are also accepted (embedded mode passes real ints/bools)."""
    if raw is None:
        return None
    try:
        if d.type == "STRING":
            if not isinstance(raw, str):
                raise ConfigError(f"{key}: expected string, got {type(raw).__name__}")
            return raw
        if d.type in ("INT", "LONG"):
            if isinstance(raw, bool):  # bool is an int subclass; reject it
                raise ValueError(raw)
            return int(raw)
        if d.type == "BOOLEAN":
            if isinstance(raw, bool):
                return raw
            s = str(raw).strip().lower()
            if s in ("true", "false"):
                return s == "true"
            raise ValueError(raw)
    except ConfigError:
        raise
    except (TypeError, ValueError):
        pass
    raise ConfigError(f"Invalid value {raw!r} for configuration {key}: expected {d.type}")


class SourceConnectorConfig:
    """Typed view over a reference-format properties map.

    >>> cfg = SourceConnectorConfig({
    ...     "db.name": "ora12c", "db.sid": "ORCLPDB1",
    ...     "db.hostname": "dbhost", "db.port": "1521",
    ...     "db.user": "c##cdc", "db.user.password": "secret",
    ...     "table.whitelist": "CRAWL.PAGES, STAGING",
    ... })
    >>> cfg.selectors()
    [('CRAWL', 'PAGES'), ('STAGING', None)]
    >>> cfg.topic_name(("CRAWL", "PAGES"))
    'ora12c.CRAWL.PAGES'
    """

    def __init__(self, properties: Mapping[str, object]):
        self._values: dict[str, object] = {}
        self.unused: dict[str, object] = {}
        missing = []
        for key, d in CONFIG_DEFS.items():
            if key in properties:
                self._values[key] = _parse_value(key, d, properties[key])
            elif d.default is _REQUIRED:
                missing.append(key)
            else:
                self._values[key] = d.default
        if missing:
            raise ConfigError(
                "Missing required configuration "
                + ", ".join(f'"{k}"' for k in missing)
                + " which has no default value."
            )
        for key, raw in properties.items():
            if key not in CONFIG_DEFS:
                self.unused[key] = raw
        dict_src = self._values[DB_LOGMINER_DICTIONARY]
        if dict_src not in LOGMINER_DICTIONARY_SOURCES:
            raise ConfigError(
                f"Invalid value {dict_src!r} for configuration {DB_LOGMINER_DICTIONARY}: "
                f"valid values are {', '.join(LOGMINER_DICTIONARY_SOURCES)}"
            )
        if self._values[DB_PORT] is not None and not (0 < self._values[DB_PORT] < 65536):
            raise ConfigError(f"Invalid value for configuration {DB_PORT}: out of range")

    # -- raw accessors (names mirror the Kotlin vals) -----------------------
    @property
    def db_name(self) -> str:
        return self._values[DB_NAME]

    @property
    def db_sid(self) -> str:
        return self._values[DB_SID]

    @property
    def db_host_name(self) -> str:
        return self._values[DB_HOST]

    @property
    def db_port(self) -> int:
        return self._values[DB_PORT]

    @property
    def db_user(self) -> str:
        return self._values[DB_USERNAME]

    @property
    def db_password(self) -> str:
        return self._values[DB_PASSWORD]

    @property
    def db_timezone(self) -> str:
        return self._values[DB_TIMEZONE]

    @property
    def logminer_dictionary_source(self) -> str:
        return self._values[DB_LOGMINER_DICTIONARY]

    @property
    def monitored_tables(self) -> list[str]:
        raw = self._values[MONITORED_TABLES]
        return [t.strip() for t in raw.split(",") if t.strip()] if raw else []

    @property
    def batch_size(self) -> int:
        return self._values[BATCH_SIZE]

    @property
    def db_fetch_size(self) -> int:
        # "If not set, it will be defaulted to batch.size"
        v = self._values[DB_FETCH_SIZE]
        return v if v is not None else self.batch_size

    @property
    def start_scn(self) -> int:
        return self._values[START_SCN]

    @property
    def poll_interval_ms(self) -> int:
        return self._values[POLL_INTERVAL_MS]

    @property
    def db_backoff_ms(self) -> int:
        return self._values[DB_BACKOFF_MS]

    @property
    def db_attempts(self) -> int:
        return self._values[DB_ATTEMPTS]

    @property
    def is_tombstones_on_delete(self) -> bool:
        return self._values[TOMBSTONES_ON_DELETE]

    # -- engine mappings -----------------------------------------------------
    def selectors(self) -> list[tuple[str, str | None]]:
        """``table.whitelist`` -> ``operators.filters`` selector tuples.

        ``OWNER.TABLE`` -> TableSelector ``(owner, table)``; a bare ``OWNER``
        -> SchemaSelector ``(owner, None)`` = every table in the schema
        (``SourceConnectorConfig.kt:86-97``)."""
        out: list[tuple[str, str | None]] = []
        for entry in self.monitored_tables:
            parts = entry.split(".")
            if len(parts) > 1:
                out.append((parts[0], parts[1]))
            else:
                out.append((parts[0], None))
        return out

    @property
    def needs_initial_snapshot(self) -> bool:
        """start.scn == 0 -> initial intake (SelectSource) then CDC;
        start.scn > 0 -> CDC only from that SCN (``SourceTask.kt:81-86``)."""
        return self.start_scn == 0

    def n_batches(self, total_events: int) -> int:
        """Convert the reference's rows-per-poll ``batch.size`` into this
        engine's ``replay(n_batches=)``: enough commit-SCN micro-batches
        that each carries ~batch.size change rows (>=1)."""
        if total_events <= 0:
            return 1
        return max(1, math.ceil(total_events / self.batch_size))

    def apply_session_timezone(self, spark) -> None:
        """``db.timezone`` -> ``spark.sql.session.timeZone`` (the engine's
        single point of naive-TIMESTAMP interpretation; see
        ``functions/types.py`` decode-layer notes)."""
        spark.conf.set("spark.sql.session.timeZone", self.db_timezone)

    def connection_info(self) -> dict[str, object]:
        """JDBC endpoint + retry policy, surfaced for source wiring parity
        (``SourceConnectorConfig.kt:31-58``); inert in file-replay mode."""
        return {
            "uri": f"{self.db_host_name}:{self.db_port}/{self.db_sid}",
            "user": self.db_user,
            "attempts": self.db_attempts,
            "backoff_ms": self.db_backoff_ms,
            "fetch_size": self.db_fetch_size,
        }

    # -- ConnectNameService port (SourceDatabaseNameService.kt:3-27) ---------
    def _table_id(self, table) -> TableId:
        if isinstance(table, TableId):
            return table
        owner, name = table
        return TableId(owner, name)

    def topic_name(self, table) -> str:
        """``sanitize(db.name + '.' + owner.table)`` — the Kafka topic each
        table's envelope records go to (``SourceDatabaseNameService.kt:20-21``)."""
        t = self._table_id(table)
        return sanitize_name(f"{self.db_name}.{t.fullname}")

    def value_record_name(self, table) -> str:
        return self.topic_name(table) + ".Envelope"

    def key_record_name(self, table) -> str:
        return self.topic_name(table) + ".Key"

    def before_after_struct_name(self, table) -> str:
        return self.topic_name(table) + ".Value"


def parse_properties_file(text: str) -> dict[str, str]:
    """Minimal java-properties parser (``key=value`` lines, ``#``/``!``
    comments, whitespace-trimmed) so an on-disk reference ``.properties``
    file loads directly. Escapes/continuations are out of scope."""
    props: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith(("#", "!")):
            continue
        for sep in ("=", ":"):
            if sep in line:
                k, _, v = line.partition(sep)
                props[k.strip()] = v.strip()
                break
    return props
