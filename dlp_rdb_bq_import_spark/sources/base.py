"""Source interface: catalog discovery + partitioned table reads.

Replaces the reference's catalog queries (common/ServerUtil.java:47-52:
INFORMATION_SCHEMA.TABLES / COLUMNS / CONSTRAINT_COLUMN_USAGE) and its
OFFSET/FETCH splittable scan (common/TableToDbRowFn.java:59-174) with a
uniform interface whose implementations map onto Spark-native
partitioned reads.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession

from ..catalog import SqlTable


class Source(ABC):
    @abstractmethod
    def list_tables(self, spark: SparkSession) -> list[SqlTable]:
        """Catalog scan: every table with its columns and PK attached
        (S1+S2+S3 of SURVEY.md §2.1)."""

    @abstractmethod
    def row_count(self, spark: SparkSession, table: SqlTable) -> int:
        """S4 sizing probe (ServerUtil.java:136-155)."""

    @abstractmethod
    def read_table(
        self, spark: SparkSession, table: SqlTable, offset_count: int = 500
    ) -> DataFrame:
        """S5 partitioned scan. ``offset_count`` = rows per split
        (README.md:99-104); implementations translate it into Spark
        partitioning (JDBC numPartitions / parquet split sizing) rather
        than O(n²) OFFSET re-sorts."""
