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


def test_fast_parser_matches_cursor_on_adversarial_statements():
    """Property fuzz (r5 VERDICT Next #4, and the guard for the round-6
    literal-scanner rewrite): fast and cursor parsers must agree — value
    for value, or error for error — on hostile statements: literals
    containing ``', ``, ``) values (``, doubled quotes, quoted identifiers
    with dots/spaces, NULL-lookalikes, negative/exponent numbers, odd hex,
    and truncations that split a statement mid-literal/mid-escape (the
    reference's LongStatementsTest.kt splits mid-escape)."""
    import random

    from logminer_kafka_connect_spark.functions.redo_parse import (
        parse_redo_statement_slow,
    )

    rng = random.Random(1234)
    hostile_strings = [
        "a', 'b",
        ") values (",
        "it''s a trap', ",
        "'' ''",
        "x" * 5000,
        "ab''" * 700,
        'say "hi"',
        "NULL",
        "null and void",
        " where 1 = 1 ",
        "TIMESTAMP '2020-01-01 00:00:00'",
        "HEXTORAW('abcd')",
        "-- comment",
        "\\n\\t",
        "&, ;, =",
    ]
    idents = ['"URL"', '"A B"', '"x.y"', '"weird\'col"', "BARE_ID", "C$#X", '"9lives"']
    literals = (
        ["'" + s.replace("'", "''") + "'" for s in hostile_strings]
        + ["NULL", "EMPTY_BLOB()", "EMPTY_CLOB()", "-12.5", "3e10", "-0.0", "42"]
        + ["HEXTORAW('deadBEEF')", "HEXTORAW('abc')", "HEXTORAW('')"]
        + ["TIMESTAMP '2021-06-01 12:00:00.123456'", "DATE '2021-06-01'",
           "TIMESTAMP '2021-06-01 12:00:00 Europe/Berlin CEST'",
           "TIMESTAMP '2021-06-01 12:00:00 +05:30'"]
    )

    def make_stmt() -> str:
        kind = rng.randrange(3)
        tbl = rng.choice(['"C"."T"', '"O W N"."T.B"', "SCHEMA.TAB"])
        n = rng.randrange(1, 6)
        cols = [rng.choice(idents) for _ in range(n)]
        vals = [rng.choice(literals) for _ in range(n)]
        if kind == 0:
            return f"insert into {tbl}({','.join(cols)}) values ({','.join(vals)})"
        conds = " and ".join(
            f"{c} IS NULL" if rng.random() < 0.2 else f"{c} = {v}"
            for c, v in zip(cols, vals)
        )
        if kind == 1:
            sets = ", ".join(f"{c} = {v}" for c, v in zip(cols, vals))
            return f"update {tbl} set {sets} where {conds}"
        return f"delete from {tbl} where {conds}"

    stmts = []
    for _ in range(4000):
        s = make_stmt()
        stmts.append(s)
        if rng.random() < 0.3:  # truncation mid-statement (CSF split analog)
            stmts.append(s[: rng.randrange(10, max(11, len(s)))])
        if rng.random() < 0.1:  # garbage injection
            i = rng.randrange(len(s))
            stmts.append(s[:i] + rng.choice(["'", '"', ",", ")", " "]) + s[i:])

    n_disagree = 0
    for s in stmts:
        try:
            fast = parse_redo_statement(s)
        except Exception:
            fast = "ERR"
        try:
            slow = parse_redo_statement_slow(s)
        except Exception:
            slow = "ERR"
        if fast != slow:
            n_disagree += 1
            assert False, f"fast={fast!r} slow={slow!r} on {s[:200]!r}"
    assert n_disagree == 0 and len(stmts) > 4000
