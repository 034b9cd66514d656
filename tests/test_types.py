"""Type-ladder unit tests — mirrors SchemaServiceTest.kt:89-196 /
BigDecimalTypeTest.kt (pure functions, no Spark)."""

import pytest
from pyspark.sql import types as T

from logminer_kafka_connect_spark.functions.types import (
    UNQUALIFIED_NUMBER,
    oracle_to_spark_type,
)


@pytest.mark.parametrize(
    "oracle,expected",
    [
        ("NUMBER(2,0)", T.ByteType()),
        ("NUMBER(1)", T.ByteType()),
        ("NUMBER(3,0)", T.ShortType()),
        ("NUMBER(4)", T.ShortType()),
        ("NUMBER(5)", T.IntegerType()),
        ("NUMBER(8)", T.IntegerType()),
        ("NUMBER(9,0)", T.IntegerType()),
        ("NUMBER(10)", T.LongType()),
        ("NUMBER(14)", T.LongType()),
        ("NUMBER(18,0)", T.LongType()),
        ("NUMBER(19,0)", T.DecimalType(19, 0)),
        # p<19 with positive scale -> float64 (ColumnSchemaBuilder.kt:73-78)
        ("NUMBER(10,2)", T.DoubleType()),
        ("NUMBER(18,6)", T.DoubleType()),
        # p>=19 with scale -> decimal, capped at Spark max precision
        ("NUMBER(20,4)", T.DecimalType(20, 4)),
        ("NUMBER(38,10)", T.DecimalType(38, 10)),
        ("NUMBER(40,10)", T.DecimalType(38, 10)),
        # unqualified NUMBER: reference Decimal(79,40) -> capped (38,20)
        ("NUMBER", UNQUALIFIED_NUMBER),
        ("NUMBER(*)", UNQUALIFIED_NUMBER),
        # negative scale widens integral range (NUMBER(2,-2) holds 4 digits)
        ("NUMBER(2,-2)", T.ShortType()),
        ("BINARY_FLOAT", T.FloatType()),
        ("BINARY_DOUBLE", T.DoubleType()),
        ("CHAR(10)", T.StringType()),
        ("VARCHAR2(255)", T.StringType()),
        ("NVARCHAR2(100)", T.StringType()),
        ("NCHAR(5)", T.StringType()),
        ("CLOB", T.StringType()),
        ("NCLOB", T.StringType()),
        ("LONG", T.StringType()),
        ("DATE", T.DateType()),
        ("TIMESTAMP", T.TimestampType()),
        ("TIMESTAMP(6)", T.TimestampType()),
        ("TIMESTAMP(9) WITH TIME ZONE", T.TimestampType()),
        ("TIMESTAMP WITH LOCAL TIME ZONE", T.TimestampType()),
        ("RAW(2000)", T.BinaryType()),
        ("BLOB", T.BinaryType()),
    ],
)
def test_ladder(oracle, expected):
    assert oracle_to_spark_type(oracle) == expected


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        oracle_to_spark_type("BFILE")
