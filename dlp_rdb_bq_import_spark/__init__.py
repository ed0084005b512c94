"""dlp_rdb_bq_import_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
``GoogleCloudPlatform/dlp-rdb-bq-import`` (two Apache Beam pipelines:
RDB→BigQuery secure import with DLP tokenization, and BigQuery→DLP
re-identify→Pub/Sub), rebuilt Spark-first:

- Catalyst/Spark SQL replaces the delegated query execution
  (reference: ``BQReidentificationPipeline.java:100-105`` hands SQL to
  BigQuery; here ``spark.sql`` runs it natively).
- Partition-ranged JDBC/parquet scans replace the OFFSET/FETCH
  splittable-DoFn pagination (reference: ``common/TableToDbRowFn.java:80-89``).
- A local FF1-style format-preserving-encryption library replaces the
  Cloud DLP service calls (reference: ``common/DLPTokenizationDoFn.java:66-159``).
- Beyond reference parity: LLM-data-pipeline operators (dedup families,
  similarity search, multimodal columns, text analysis) designed for
  100 TB scale.

All modules cite the reference file:line they provide parity with.
"""

__version__ = "0.1.0"
