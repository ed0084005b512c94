"""Type-mapping tests over all 28 SqlDataType entries (SURVEY.md §1.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dlp_rdb_bq_import_spark.types import (
    SQL_DATA_TYPES,
    UnknownSourceType,
    to_bigquery_type,
    to_spark_type,
)


def test_all_28_types_enumerated():
    assert len(SQL_DATA_TYPES) == 28


@pytest.mark.parametrize("decl,expected", [
    ("varchar(50)", T.StringType()),
    ("NVARCHAR", T.StringType()),
    ("text", T.StringType()),
    ("bigint", T.LongType()),
    ("int", T.LongType()),
    ("tinyint", T.LongType()),
    ("smallint", T.LongType()),
    ("float", T.DoubleType()),
    ("real", T.DoubleType()),
    ("bit", T.BooleanType()),
    ("date", T.DateType()),
    ("time", T.StringType()),
    ("datetime", T.TimestampNTZType()),
    ("datetime2", T.TimestampNTZType()),
    ("smalldatetime", T.TimestampNTZType()),
    ("datetimeoffset", T.TimestampType()),
    ("timestamp", T.StringType()),  # rowversion
    ("binary", T.BinaryType()),
    ("varbinary", T.BinaryType()),
    ("image", T.BinaryType()),
    ("uniqueidentifier", T.StringType()),
])
def test_fidelity_mapping(decl, expected):
    assert to_spark_type(decl) == expected


def test_decimal_fidelity_vs_compat():
    assert to_spark_type("decimal(10,2)") == T.DecimalType(10, 2)
    assert to_spark_type("numeric(18,4)") == T.DecimalType(18, 4)
    assert to_spark_type("money") == T.DecimalType(38, 4)
    # compat reproduces the reference's DECIMAL→FLOAT loss (ServerUtil.java:60-66)
    for decl in ["decimal(10,2)", "numeric", "money", "smallmoney"]:
        assert to_spark_type(decl, mode="compat") == T.DoubleType()


def test_bigquery_names_match_reference():
    # ServerUtil.java:55-85
    assert to_bigquery_type("varchar(10)") == "STRING"
    assert to_bigquery_type("int") == "INTEGER"
    assert to_bigquery_type("decimal(9,2)") == "FLOAT"
    assert to_bigquery_type("bit") == "BOOLEAN"
    assert to_bigquery_type("datetime") == "DATETIME"
    assert to_bigquery_type("datetimeoffset") == "TIMESTAMP"
    assert to_bigquery_type("timestamp") == "STRING"
    assert to_bigquery_type("image") == "BYTES"


def test_unknown_type_raises():
    # reference throws on unknown names (ServerUtil.java:216-221)
    with pytest.raises(UnknownSourceType):
        to_spark_type("geography")
    with pytest.raises(UnknownSourceType):
        to_bigquery_type("sql_variant")
