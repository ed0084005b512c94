"""M0 — the reference's own end-to-end integration slice, natively.

Mirrors DBImportPipelineIT.testE2EDBImportPipeline
(DBImportPipelineIT.java:52-89): run the import pipeline against the
mock source (``TEST_HOST`` sentinel semantics), then assert
``SELECT count(*) FROM dataset.DBO_TEST_TABLE`` == 1.
"""

from __future__ import annotations

from dlp_rdb_bq_import_spark.config import ImportJobOptions
from dlp_rdb_bq_import_spark.plans.import_job import run_import
from dlp_rdb_bq_import_spark.sinks.warehouse import Warehouse


def test_e2e_mock_import(spark, tmp_path):
    options = ImportJobOptions(
        jdbc_spec="mock://",
        dataset="TEST_DATA_SET",
        offset_count=1,  # the IT runs with offset=1 (DBImportPipelineIT.java:73-76)
        warehouse_dir=str(tmp_path),
    )
    results = run_import(spark, options)
    assert [r.status for r in results] == ["ok"]

    wh = Warehouse(str(tmp_path))
    df = wh.read(spark, "TEST_DATA_SET", "DBO_TEST_TABLE")
    df.createOrReplaceTempView("dbo_test_table")
    total = spark.sql("SELECT count(*) AS total FROM dbo_test_table").collect()[0][0]
    assert total == 1

    row = df.collect()[0]
    assert row["NAME"] == "myname"
    assert row["COLUMN2_NAME"] == 10


def test_exclusion_filter(spark, tmp_path):
    """Exclusion spec 'TEST_TABLE' drops the only table (ServerUtil.java:126-134)."""
    options = ImportJobOptions(
        jdbc_spec="mock://",
        dataset="TEST_DATA_SET",
        excluded_tables="TEST_TABLE-OTHER",
        warehouse_dir=str(tmp_path),
    )
    results = run_import(spark, options)
    assert results == []
