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
