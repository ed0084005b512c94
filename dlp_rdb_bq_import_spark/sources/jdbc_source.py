"""JDBC source: catalog discovery + range-partitioned parallel scans.

Parity with the reference's SQL Server path:
- table list — ``SELECT TABLE_SCHEMA, TABLE_NAME, TABLE_TYPE FROM
  INFORMATION_SCHEMA.TABLES`` (ServerUtil.java:47-48,103-124);
- ordered columns — INFORMATION_SCHEMA.COLUMNS (ServerUtil.java:49-50,179-204);
- PK probe — CONSTRAINT_COLUMN_USAGE with ``PK%`` constraint
  (ServerUtil.java:51-52,157-177);
- row-count probe — SELECT COUNT(*) (ServerUtil.java:136-155; that code
  ignores its schemaName arg — ours does not);
- partitioned scan — the reference pages with ``ORDER BY pk OFFSET
  o*(i-1) FETCH NEXT o ROWS ONLY`` per splittable-DoFn restriction
  (TableToDbRowFn.java:80-89,150-174), which re-sorts the table per page
  (O(n²/b) work server-side) and double-executes each page query
  (TableToDbRowFn.java:92-93 — reference bug, not reproduced). We issue
  ONE ``spark.read.jdbc`` with ``partitionColumn/lowerBound/upperBound/
  numPartitions`` → Spark generates non-overlapping range predicates,
  each split a single index-range scan. Same result set, linear work,
  and numPartitions = ceil(rowcount / offset_count) preserves the
  reference's split arithmetic (TableToDbRowFn.java:157).

Dialect surface: the SQL text (catalog probes, count/bounds, the
reference's paged-scan shape) is parameterized per engine in
``sources/dialects.py`` — ``sqlserver`` preserves the reference's
strings verbatim-testably, ``postgresql``/``mysql``/``derby`` adapt the
forms each engine actually accepts. The execution path is exercised
LIVE against an in-process Derby database (tests/test_jdbc_live.py —
Derby ships with Spark's JVM), which uses the ``metadata`` catalog
strategy; the INFORMATION_SCHEMA strategy's SQL strings are
dialect-tested string-for-string against the reference's forms.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..catalog import SqlColumn, SqlTable
from .base import Source
from .dialects import SQLSERVER, SqlDialect, dialect_for_url, get_dialect

# Reference-parity aliases (the SQL Server dialect is the reference's).
TABLES_QUERY = SQLSERVER.tables_query
COLUMNS_QUERY = SQLSERVER.columns_query
PK_QUERY = SQLSERVER.pk_query
COUNT_QUERY = SQLSERVER.count_query
BOUNDS_QUERY = SQLSERVER.bounds_query


def num_partitions_for(row_count: int, offset_count: int) -> int:
    """splits = ceil(count/offset) with a 1 floor (TableToDbRowFn.java:150-167)."""
    return max(1, math.ceil(row_count / max(1, offset_count)))


class JdbcSource(Source):
    """``dialect`` picks the engine's SQL forms (a ``SqlDialect``, a
    name like ``"sqlserver"``, or None to infer from the URL scheme);
    ``catalog_strategy`` overrides the dialect's default:

    - ``"information_schema"`` — the reference's SQL Server dialect
      queries (ServerUtil.java:47-52 parity), reused by engines that
      ship INFORMATION_SCHEMA (PostgreSQL, MySQL with its
      KEY_COLUMN_USAGE PK probe);
    - ``"metadata"`` — the standard ``java.sql.DatabaseMetaData``
      catalog API (getTables/getColumns/getPrimaryKeys), which works
      across JDBC engines (Derby/H2/...) and is what lets the catalog
      path run against a live in-process Derby in tests.
    """

    def __init__(
        self,
        url: str,
        properties: dict[str, str] | None = None,
        catalog_strategy: str | None = None,
        dialect: SqlDialect | str | None = None,
    ):
        self.url = url
        self.properties = dict(properties or {})
        if dialect is None:
            self.dialect = dialect_for_url(url)
        elif isinstance(dialect, str):
            self.dialect = get_dialect(dialect)
        else:
            self.dialect = dialect
        self.catalog_strategy = catalog_strategy or self.dialect.catalog_strategy

    def _read_query(self, spark: SparkSession, query: str) -> DataFrame:
        return (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("query", query)
            .options(**self.properties)
            .load()
        )

    def list_tables(self, spark: SparkSession) -> list[SqlTable]:
        if self.catalog_strategy == "metadata":
            return self.list_tables_via_metadata(spark)
        return self._list_tables_information_schema(spark)

    def list_tables_via_metadata(self, spark: SparkSession) -> list[SqlTable]:
        """Catalog discovery through ``java.sql.DatabaseMetaData`` — the
        engine-portable analogue of the reference's INFORMATION_SCHEMA
        queries (ServerUtil.java:103-204). Driver-side and tiny (catalog
        rows only); the data scan itself stays a distributed
        ``spark.read.jdbc``."""
        jvm = spark._jvm
        gateway = spark.sparkContext._gateway
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            if k != "driver":
                props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            meta = conn.getMetaData()
            types_arr = gateway.new_array(jvm.java.lang.String, 1)
            types_arr[0] = "TABLE"
            tables: list[SqlTable] = []
            rs = meta.getTables(None, None, "%", types_arr)
            found: list[tuple[str, str]] = []
            while rs.next():
                found.append((rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME")))
            rs.close()
            for i, (schema, name) in enumerate(found):
                pk_rs = meta.getPrimaryKeys(None, schema, name)
                pks = set()
                while pk_rs.next():
                    pks.add(pk_rs.getString("COLUMN_NAME"))
                pk_rs.close()
                col_rs = meta.getColumns(None, schema, name, "%")
                cols = []
                while col_rs.next():
                    cols.append(
                        SqlColumn(
                            name=col_rs.getString("COLUMN_NAME"),
                            ordinal_position=int(col_rs.getInt("ORDINAL_POSITION")),
                            default_value=col_rs.getString("COLUMN_DEF"),
                            nullable=(col_rs.getString("IS_NULLABLE") or "").upper() == "YES",
                            data_type=col_rs.getString("TYPE_NAME"),
                            primary_key=col_rs.getString("COLUMN_NAME") in pks,
                        )
                    )
                col_rs.close()
                cols.sort(key=lambda c: c.ordinal_position)
                tables.append(
                    SqlTable(
                        schema=schema, name=name, table_type="BASE TABLE", key=i,
                        columns=tuple(cols),
                    )
                )
            return tables
        finally:
            conn.close()

    def _list_tables_information_schema(self, spark: SparkSession) -> list[SqlTable]:
        d = self.dialect
        tables: list[SqlTable] = []
        rows = self._read_query(spark, d.tables_query).collect()  # catalog: tiny
        for i, r in enumerate(rows):
            schema, name, ttype = r[0], r[1], r[2]
            col_rows = self._read_query(
                spark, d.columns_query.format(schema=schema, table=name)
            ).collect()
            pk_rows = self._read_query(
                spark, d.pk_query.format(schema=schema, table=name)
            ).collect()
            pk = pk_rows[0][0] if pk_rows else None
            cols = tuple(
                SqlColumn(
                    name=c[0],
                    ordinal_position=int(c[1]),
                    default_value=c[2],
                    nullable=(str(c[3]).upper() == "YES"),
                    data_type=str(c[4]),
                    primary_key=(c[0] == pk),
                )
                for c in col_rows
            )
            tables.append(SqlTable(schema=schema, name=name, table_type=ttype, key=i, columns=cols))
        return tables

    def row_count(self, spark: SparkSession, table: SqlTable) -> int:
        df = self._read_query(
            spark, self.dialect.count_query.format(schema=table.schema, table=table.name)
        )
        return int(df.collect()[0][0])

    def read_table(
        self, spark: SparkSession, table: SqlTable, offset_count: int = 500
    ) -> DataFrame:
        pk = table.primary_key_column
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", f"{table.schema}.{table.name}")
            .options(**self.properties)
        )
        if pk is not None:
            n = self.row_count(spark, table)
            bounds = self._read_query(
                spark,
                self.dialect.bounds_query.format(
                    pk=pk, schema=table.schema, table=table.name
                ),
            ).collect()[0]
            if bounds[0] is not None:
                reader = (
                    reader.option("partitionColumn", pk)
                    .option("lowerBound", str(bounds[0]))
                    .option("upperBound", str(bounds[1]))
                    .option("numPartitions", str(num_partitions_for(n, offset_count)))
                )
        return reader.load()

    def read_incremental(
        self,
        spark: SparkSession,
        table: SqlTable,
        watermark_col: str,
        last_value,
        offset_count: int = 500,
    ) -> DataFrame:
        """Incremental scan: rows with ``watermark_col > last_value``
        only — the change-capture read the reference lacks (it reloads
        every table in full each run, DBImportPipeline.java:97-113).

        The predicate is part of the pushed-down dbtable subquery, so
        the database evaluates it (index range scan on the watermark
        column), and the range partitioning applies on top of the
        filtered set — an incremental batch of any size still splits
        across executors. String values are quoted; numeric/temporal
        values pass through str().
        """
        if isinstance(last_value, str):
            lit = "'" + last_value.replace("'", "''") + "'"
        else:
            lit = str(last_value)
        filtered = (
            f"(SELECT * FROM {table.schema}.{table.name} "
            f"WHERE {watermark_col} > {lit}) incr"
        )
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", filtered)
            .options(**self.properties)
        )
        pk = table.primary_key_column
        if pk is not None:
            bounds = self._read_query(
                spark,
                f"SELECT MIN({pk}) AS lo, MAX({pk}) AS hi, COUNT(*) AS n "
                f"FROM {table.schema}.{table.name} WHERE {watermark_col} > {lit}",
            ).collect()[0]
            if bounds[0] is not None:
                reader = (
                    reader.option("partitionColumn", pk)
                    .option("lowerBound", str(bounds[0]))
                    .option("upperBound", str(bounds[1]))
                    .option(
                        "numPartitions",
                        str(num_partitions_for(int(bounds[2]), offset_count)),
                    )
                )
        return reader.load()
