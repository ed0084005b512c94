"""Dialect-string tests: the SQL Server dialect must emit the
reference's exact SQL forms (ServerUtil.java:47-52 catalog probes,
TableToDbRowFn.java:80-89 pagination), and the other dialects must emit
the forms their engines actually accept. Pure string tests — the live
execution path is covered by tests/test_jdbc_live.py against Derby.
"""

from __future__ import annotations

import pytest

from dlp_rdb_bq_import_spark.sources.dialects import (
    DERBY,
    MYSQL,
    POSTGRESQL,
    SQLSERVER,
    dialect_for_url,
    get_dialect,
)
from dlp_rdb_bq_import_spark.sources.jdbc_source import JdbcSource


def test_sqlserver_tables_query_matches_reference_verbatim():
    # ServerUtil.java:47-48
    assert SQLSERVER.tables_query == (
        "SELECT TABLE_SCHEMA, TABLE_NAME, TABLE_TYPE FROM INFORMATION_SCHEMA.TABLES"
    )


def test_sqlserver_columns_query_reference_shape():
    """ServerUtil.java:49-50 selects the same five columns ordered by
    ORDINAL_POSITION; we add the TABLE_SCHEMA predicate the reference
    omits (same-named tables in two schemas collide there)."""
    q = SQLSERVER.columns_query.format(schema="dbo", table="t1")
    assert q.startswith(
        "SELECT COLUMN_NAME, ORDINAL_POSITION, COLUMN_DEFAULT, IS_NULLABLE, DATA_TYPE "
        "FROM INFORMATION_SCHEMA.COLUMNS"
    )
    assert "TABLE_SCHEMA = 'dbo'" in q and "TABLE_NAME = 't1'" in q
    assert q.endswith("ORDER BY ORDINAL_POSITION")


def test_sqlserver_pk_query_reference_shape():
    # ServerUtil.java:51-52: CONSTRAINT_COLUMN_USAGE, LIKE 'PK%'
    q = SQLSERVER.pk_query.format(schema="dbo", table="t1")
    assert "INFORMATION_SCHEMA.CONSTRAINT_COLUMN_USAGE" in q
    assert "CONSTRAINT_NAME LIKE 'PK%'" in q
    assert "TABLE_SCHEMA = 'dbo'" in q


def test_sqlserver_page_sql_matches_reference_verbatim():
    # TableToDbRowFn.java:80-89: OFFSET n * (i - 1) ROWS FETCH NEXT n ROWS ONLY
    sql = SQLSERVER.paged_scan_sql("dbo", "orders", "o_orderkey", 500, 3)
    assert sql == (
        "SELECT * FROM dbo.orders ORDER BY o_orderkey "
        "OFFSET 500 * (3 - 1) ROWS FETCH NEXT 500 ROWS ONLY"
    )


def test_mysql_dialect_forms():
    """MySQL has no CONSTRAINT_COLUMN_USAGE view and no OFFSET/FETCH."""
    q = MYSQL.pk_query.format(schema="s", table="t")
    assert "KEY_COLUMN_USAGE" in q and "CONSTRAINT_NAME = 'PRIMARY'" in q
    sql = MYSQL.paged_scan_sql("s", "t", "id", 100, 2)
    # MySQL accepts only literal LIMIT/OFFSET arguments — the skip must
    # arrive precomputed, never as the reference's arithmetic form
    assert "LIMIT 100 OFFSET 100" in sql and "(" not in sql.split("LIMIT")[1]
    assert "FETCH NEXT" not in sql
    assert MYSQL.quote("a`b") == "`a``b`"


def test_postgres_dialect_filters_system_schemas():
    assert "pg_catalog" in POSTGRESQL.tables_query
    # ANSI OFFSET/FETCH passes through unchanged
    assert POSTGRESQL.page_template == SQLSERVER.page_template


def test_derby_uses_metadata_catalog():
    """Derby ships no INFORMATION_SCHEMA — the dialect must route
    catalog discovery through java.sql.DatabaseMetaData."""
    assert DERBY.catalog_strategy == "metadata"


def test_derby_pagination_has_literal_offset():
    """Derby's result-offset clause accepts only an integer literal or
    a ? placeholder — never the reference's arithmetic form."""
    sql = DERBY.paged_scan_sql("app", "t", "id", 500, 3)
    assert "OFFSET 1000 ROWS FETCH NEXT 500 ROWS ONLY" in sql


def test_identifier_quoting_styles():
    assert SQLSERVER.quote("week]ly") == "[week]]ly]"
    assert POSTGRESQL.quote('a"b') == '"a""b"'


def test_dialect_inferred_from_url():
    cases = {
        "jdbc:sqlserver://host;databaseName=db": "sqlserver",
        "jdbc:postgresql://host/db": "postgresql",
        "jdbc:mysql://host/db": "mysql",
        "jdbc:mariadb://host/db": "mysql",
        "jdbc:derby:memory:db": "derby",
        "jdbc:exotic://elsewhere": "sqlserver",  # reference fallback
    }
    for url, expected in cases.items():
        assert dialect_for_url(url).name == expected
        assert JdbcSource(url).dialect.name == expected


def test_source_dialect_overrides():
    src = JdbcSource("jdbc:exotic://x", dialect="mysql")
    assert src.dialect is MYSQL
    assert src.catalog_strategy == "information_schema"
    src2 = JdbcSource("jdbc:derby:memory:db")
    assert src2.catalog_strategy == "metadata"
    src3 = JdbcSource("jdbc:derby:memory:db", catalog_strategy="information_schema")
    assert src3.catalog_strategy == "information_schema"  # explicit override wins
    with pytest.raises(ValueError):
        get_dialect("oracle-nope")
