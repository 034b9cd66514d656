"""Redo-SQL parser unit tests — mirrors DMLOperationsTest.kt (op/image
shapes), Issue14Test (explicit NULL), LongStatementsTest via generator
round-trip elsewhere."""

import json

import pytest

from logminer_kafka_connect_spark.functions.redo_parse import (
    _normalize_ts,
    parse_redo_statement,
)


def test_insert_full_row():
    before, after = parse_redo_statement(
        'insert into "CRAWL"."PAGES"("URL","LANG","N") values (\'https://x/1\',\'en\',42)'
    )
    assert before is None
    assert after == {"URL": "https://x/1", "LANG": "en", "N": "42"}


def test_insert_with_escaped_quote_and_hex():
    before, after = parse_redo_statement(
        "insert into \"C\".\"T\"(\"A\",\"B\") values ('o''brien',HEXTORAW('DEADBEEF'))"
    )
    assert after == {"A": "o'brien", "B": "deadbeef"}


def test_update_set_and_where_images():
    before, after = parse_redo_statement(
        'update "C"."T" set "LANG" = \'de\', "N" = 7 where "URL" = \'u1\' and "LANG" = \'en\''
    )
    # after = SET columns only (pre-enrichment, DMLOperationsTest.kt:55-67)
    assert after == {"LANG": "de", "N": "7"}
    assert before == {"URL": "u1", "LANG": "en"}


def test_update_to_null_is_present_null():
    _, after = parse_redo_statement('update "C"."T" set "LANG" = NULL where "URL" = \'u\'')
    assert "LANG" in after and after["LANG"] is None
    assert json.loads(json.dumps(after))["LANG"] is None


def test_delete_where_with_is_null():
    before, after = parse_redo_statement(
        'delete from "C"."T" where "URL" = \'u1\' and "LANG" IS NULL'
    )
    assert after is None
    assert before == {"URL": "u1", "LANG": None}


def test_null_literal_string_vs_keyword():
    # the *string* 'NULL' must survive; the keyword must not (C6)
    _, after = parse_redo_statement("insert into \"C\".\"T\"(\"A\",\"B\") values ('NULL',NULL)")
    assert after == {"A": "NULL", "B": None}


def test_timestamp_flavors_normalized():
    assert _normalize_ts("2024-03-01 10:00:00") == "2024-03-01 10:00:00.000000"
    assert _normalize_ts("2024-03-01 10:00:00.5") == "2024-03-01 10:00:00.500000"
    # offset flavor (TIMESTAMP WITH LOCAL TIME ZONE literal)
    assert _normalize_ts("2024-03-01 12:00:00 +02:00") == "2024-03-01 10:00:00.000000"
    # zone-name flavor (TIMESTAMP WITH TIME ZONE literal; CET = UTC+1)
    assert _normalize_ts("2024-03-01 11:00:00.25 Europe/Berlin CET") == (
        "2024-03-01 10:00:00.250000"
    )
    # US/Pacific with abbreviation (ColumnSchemaBuilder.kt:182-188 pattern)
    assert _normalize_ts("2024-07-01 05:00:00 US/Pacific PDT") == "2024-07-01 12:00:00.000000"


def test_unsupported_statement_raises():
    with pytest.raises(ValueError):
        parse_redo_statement("Unsupported Type [binary]")


def test_trailing_comment_tolerated():
    _, after = parse_redo_statement(
        "insert into \"C\".\"T\"(\"A\") values ('x') -- temporary tables"
    )
    assert after == {"A": "x"}


def test_fast_parser_matches_cursor_oracle_on_generator_output():
    """Differential pin: the round-3 regex fast path must agree with the
    rounds-1/2 cursor parser statement-for-statement on realistic redo SQL
    (including CSF-reassembled multi-KB statements and noise)."""
    from logminer_kafka_connect_spark.functions.redo_parse import (
        parse_redo_statement_slow,
    )
    from logminer_kafka_connect_spark.sources.generator import CdcGenerator, GeneratorConfig

    gen = CdcGenerator(GeneratorConfig(seed=13, n_txns=400, n_urls=300, n_snapshot=0))
    pdf = gen.events_pdf()
    stmts = [
        s
        for s, op in zip(pdf["sql_redo"], pdf["op_code"])
        if op in (1, 2, 3) and s
    ]
    assert len(stmts) > 500
    n_err = 0
    for s in stmts:
        try:
            fast = parse_redo_statement(s)
        except Exception as e:
            fast = ("ERR", type(e).__name__)
        try:
            slow = parse_redo_statement_slow(s)
        except Exception as e:
            slow = ("ERR", type(e).__name__)
        if isinstance(fast, tuple) and fast and fast[0] == "ERR":
            n_err += 1
        assert fast == slow, s[:200]
    # CSF chunks are expected to fail in BOTH parsers (reassembly happens
    # upstream); agreement on failures is part of the contract
    assert n_err < len(stmts)
