"""Connector-config compatibility — SourceConnectorConfigTest.kt analog.

A reference user's `.properties` map must load unchanged: same 16 keys,
same types/defaults/required set as ``SourceConnectorConfig.kt:135-250``,
same whitelist-selector expansion (``:86-97``) and topic naming
(``SourceDatabaseNameService.kt:5-27``), and the ``start.scn`` start
decision of ``SourceTask.kt:66-95`` driving the engine end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logminer_kafka_connect_spark import config as C
from logminer_kafka_connect_spark.config import (
    ConfigError,
    SourceConnectorConfig,
    parse_properties_file,
)
from logminer_kafka_connect_spark.engine import (
    PAGES_SCHEMA,
    CdcEngine,
    MultiTableCdcEngine,
    TableSpec,
)
from logminer_kafka_connect_spark.operators.apply import parse_committed
from logminer_kafka_connect_spark.operators.consolidate import consolidate
from logminer_kafka_connect_spark.operators.envelope import to_envelope
from logminer_kafka_connect_spark.sources.generator import SCN0, CdcGenerator, GeneratorConfig

REQUIRED = {
    "db.name": "ora12c",
    "db.sid": "ORCLPDB1",
    "db.hostname": "dbhost.example",
    "db.port": "1521",
    "db.user": "c##cdc",
    "db.user.password": "secret",
}


def _cfg(**overrides) -> SourceConnectorConfig:
    props = dict(REQUIRED)
    props.update(overrides)  # CPython allows dotted keys through **kwargs
    return SourceConnectorConfig(props)


# ---------------------------------------------------------------- validation


def test_defaults_match_reference_configdef():
    cfg = _cfg()
    # SourceConnectorConfig.kt defaults, key by key
    assert cfg.logminer_dictionary_source == "ONLINE"
    assert cfg.db_timezone == "UTC"
    assert cfg.monitored_tables == []
    assert cfg.is_tombstones_on_delete is True
    assert cfg.batch_size == 1000
    assert cfg.db_fetch_size == 1000  # nullable, "defaulted to batch.size"
    assert cfg.start_scn == 0
    assert cfg.db_attempts == 3
    assert cfg.db_backoff_ms == 10000
    assert cfg.poll_interval_ms == 2000


def test_missing_required_keys_listed():
    with pytest.raises(ConfigError) as ei:
        SourceConnectorConfig({"db.name": "x"})
    msg = str(ei.value)
    for key in ("db.sid", "db.hostname", "db.port", "db.user", "db.user.password"):
        assert key in msg


def test_string_typed_properties_parse():
    """Kafka Connect delivers every value as a string."""
    props = dict(REQUIRED)
    props.update(
        {
            "batch.size": "250",
            "start.scn": "123456789012",
            "tombstones.on.delete": "False",
            "poll.interval.ms": "500",
        }
    )
    cfg = SourceConnectorConfig(props)
    assert cfg.batch_size == 250
    assert cfg.start_scn == 123456789012
    assert cfg.is_tombstones_on_delete is False
    assert cfg.poll_interval_ms == 500


@pytest.mark.parametrize(
    "key,value",
    [
        ("db.port", "not-a-port"),
        ("db.port", "99999"),
        ("batch.size", "many"),
        ("tombstones.on.delete", "yes"),  # ConfigDef booleans are true/false only
        ("db.logminer.dictionary", "OFFLINE"),
        ("start.scn", "1.5"),
    ],
)
def test_invalid_values_raise(key, value):
    props = dict(REQUIRED)
    props[key] = value
    with pytest.raises(ConfigError):
        SourceConnectorConfig(props)


def test_unknown_keys_collected_not_fatal():
    props = dict(REQUIRED)
    props["connector.class"] = "com.github.thake.logminer.kafka.connect.LogminerSourceConnector"
    props["tasks.max"] = "1"
    cfg = SourceConnectorConfig(props)
    assert set(cfg.unused) == {"connector.class", "tasks.max"}


def test_fetch_size_explicit_overrides_batch_default():
    cfg = _cfg(**{"db.fetch.size": "5000", "batch.size": "100"})
    assert cfg.db_fetch_size == 5000
    assert cfg.connection_info()["fetch_size"] == 5000
    assert cfg.connection_info()["uri"] == "dbhost.example:1521/ORCLPDB1"


# ------------------------------------------------------------ selectors/topics


def test_whitelist_selector_expansion():
    """OWNER.TABLE -> TableSelector, bare OWNER -> SchemaSelector
    (SourceConnectorConfig.kt:86-97); whitespace trimmed like the
    reference's split(',').map{trim}."""
    cfg = _cfg(**{"table.whitelist": " CRAWL.PAGES ,STAGING , CRAWL.LINKS"})
    assert cfg.selectors() == [
        ("CRAWL", "PAGES"),
        ("STAGING", None),
        ("CRAWL", "LINKS"),
    ]
    assert _cfg().selectors() == []


def test_topic_and_record_names_sanitized():
    """SourceDatabaseNameService.kt:5-27 — invalid chars -> '_', names are
    db.name + '.' + owner.table (+ .Envelope/.Key/.Value)."""
    cfg = _cfg(**{"db.name": "prod db!"})
    assert cfg.topic_name(("CRAWL", "PAGES")) == "prod_db_.CRAWL.PAGES"
    assert cfg.value_record_name(("CRAWL", "PAGES")) == "prod_db_.CRAWL.PAGES.Envelope"
    assert cfg.key_record_name(("CRAWL", "PAGES")) == "prod_db_.CRAWL.PAGES.Key"
    assert cfg.before_after_struct_name(("CRAWL", "PAGES")) == "prod_db_.CRAWL.PAGES.Value"


def test_start_scn_policy_and_batch_arithmetic():
    assert _cfg().needs_initial_snapshot is True
    cfg = _cfg(**{"start.scn": str(SCN0)})
    assert cfg.needs_initial_snapshot is False
    assert _cfg(**{"batch.size": "100"}).n_batches(1000) == 10
    assert _cfg(**{"batch.size": "100"}).n_batches(101) == 2
    assert _cfg().n_batches(0) == 1


def test_parse_properties_file():
    text = """
# reference quickstart config
name=logminer-connector
db.name = ora12c
db.sid: ORCLPDB1
! another comment style
db.hostname=dbhost.example
db.port=1521
db.user=c##cdc
db.user.password=se=cret
table.whitelist=CRAWL.PAGES
"""
    props = parse_properties_file(text)
    assert props["db.user.password"] == "se=cret"  # first separator wins
    assert props["db.sid"] == "ORCLPDB1"
    cfg = SourceConnectorConfig(props)
    assert cfg.selectors() == [("CRAWL", "PAGES")]
    assert "name" in cfg.unused


# ------------------------------------------------------------------ envelope


def test_envelope_topic_column(spark):
    gen = CdcGenerator(GeneratorConfig(seed=5, n_txns=40, n_urls=60, n_snapshot=0))
    events = spark.createDataFrame(gen.events_pdf())
    parsed = parse_committed(consolidate(events, [("CRAWL", "PAGES")])).filter(
        F.col("parse_error").isNull()
    )
    env = to_envelope(parsed, PAGES_SCHEMA, tombstones=True, db_name="prod db!").cache()
    try:
        topics = [r["topic"] for r in env.select("topic").distinct().collect()]
        assert topics == ["prod_db_.CRAWL.PAGES"]
        # tombstones ride the same topic as their delete
        assert env.filter("op = 't'").filter(F.col("topic").isNull()).count() == 0
        assert env.columns[0] == "topic"
    finally:
        env.unpersist()
    # without db_name the column is absent (backwards compatible)
    assert "topic" not in to_envelope(parsed, PAGES_SCHEMA).columns


# ------------------------------------------------------------------ e2e wiring


def test_engine_from_properties_snapshot_then_cdc(spark, tmpdir_path):
    """start.scn=0: initial intake then CDC (SourceTask.kt:81-86) — final
    state must equal the generator's independent expected-state oracle."""
    from tests.test_replay_e2e import _assert_state_equal

    props = dict(REQUIRED)
    props.update({"table.whitelist": "CRAWL.PAGES", "batch.size": "200", "db.timezone": "UTC"})
    gen = CdcGenerator(GeneratorConfig(seed=23, n_txns=60, n_urls=120, n_snapshot=40))
    eng = CdcEngine.from_properties(spark, tmpdir_path, props, n_buckets=8)
    assert eng.config.is_tombstones_on_delete
    snap = spark.createDataFrame(gen.snapshot_pdf())
    stats = eng.run_from_config(
        gen.events_df(spark), snapshot_source=snap, snapshot_scn=SCN0 - 1
    )
    assert stats.n_parse_errors == 0
    _assert_state_equal(
        eng.state().toPandas(), gen.expected_final_state(include_snapshot=True)
    )
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_engine_from_properties_start_scn_skips_snapshot(spark, tmpdir_path):
    """start.scn>0: no snapshot even if a source is offered; CDC starts at
    the configured SCN (SourceTask.kt:81-86 createOffsetFromConfig)."""
    from tests.test_replay_e2e import _assert_state_equal

    props = dict(REQUIRED)
    props["start.scn"] = str(SCN0)
    gen = CdcGenerator(GeneratorConfig(seed=29, n_txns=50, n_urls=100, n_snapshot=30))
    eng = CdcEngine.from_properties(spark, tmpdir_path, props, n_buckets=8)
    snap = spark.createDataFrame(gen.snapshot_pdf())
    eng.run_from_config(gen.events_df(spark), snapshot_source=snap, snapshot_scn=SCN0 - 1)
    # snapshot-only rows are absent: state reflects CDC alone
    _assert_state_equal(
        eng.state().toPandas(), gen.expected_final_state(include_snapshot=False)
    )


def test_multitable_from_properties_whitelist(spark, tmpdir_path):
    specs = [
        TableSpec("CRAWL", "PAGES", PAGES_SCHEMA, "url"),
        TableSpec("CRAWL", "LINKS", PAGES_SCHEMA, "url"),
        TableSpec("OTHER", "T1", PAGES_SCHEMA, "url"),
    ]
    props = dict(REQUIRED)
    props["table.whitelist"] = "CRAWL"  # schema selector -> both CRAWL tables
    eng = MultiTableCdcEngine.from_properties(spark, tmpdir_path, props, specs)
    assert set(eng._tables) == {"PAGES", "LINKS"}

    props["table.whitelist"] = "CRAWL.PAGES"
    eng2 = MultiTableCdcEngine.from_properties(spark, tmpdir_path + "/2", props, specs)
    assert set(eng2._tables) == {"PAGES"}

    props["table.whitelist"] = "NOPE.MISSING"
    with pytest.raises(ValueError):
        MultiTableCdcEngine.from_properties(spark, tmpdir_path + "/3", props, specs)


def test_config_defs_cover_reference_key_set():
    """Every key the reference defines, nothing extra."""
    assert set(C.CONFIG_DEFS) == {
        "db.name",
        "db.sid",
        "db.hostname",
        "db.port",
        "db.user",
        "db.user.password",
        "db.attempts",
        "db.backoff.ms",
        "db.logminer.dictionary",
        "db.timezone",
        "table.whitelist",
        "db.fetch.size",
        "start.scn",
        "batch.size",
        "poll.interval.ms",
        "tombstones.on.delete",
    }
