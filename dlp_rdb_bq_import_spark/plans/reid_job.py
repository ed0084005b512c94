"""The re-identification pipeline — native re-expression of
``BQReidentificationPipeline`` (BQReidentificationPipeline.java:67-132,
lifecycle in SURVEY.md §3.2).

Stages:
1. Query — the reference hands SQL to BigQuery (:100-105); we run it
   natively via ``spark.sql`` over registered views.
2. Header grouping — the reference shuffles rows into groups keyed by
   their comma-joined header list (:106-107,135-155) purely to batch DLP
   requests. In a DataFrame all rows share one schema, so the grouping
   degenerates to Arrow batching inside ``mapInPandas`` — the shuffle is
   *eliminated*, not translated (at 100 TB, that is the difference
   between a no-op and a full-data shuffle).
3. Re-identify — inverse FPE over configured columns (:160-261).
4. Column rename map — side-input rename (:109-112,266-311) becomes a
   driver-side ``withColumnsRenamed`` (metadata-only projection).
5. Publish — batched JSON messages (:124-129).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import ReidJobOptions
from ..functions.tokenize import TemplateRegistry, reidentify
from ..sinks.messages import publish_json


def run_reid(
    spark: SparkSession,
    options: ReidJobOptions,
    templates: TemplateRegistry | None = None,
) -> DataFrame:
    df = spark.sql(options.query)

    if options.deid_template and templates and options.deid_template in templates:
        df = reidentify(df, templates.get(options.deid_template))

    if options.column_map:
        # Only rename columns present (reference tolerates misses,
        # BQReidentificationPipeline.java:288-300).
        mapping = {k: v for k, v in options.column_map.items() if k in df.columns}
        if mapping:
            df = df.withColumnsRenamed(mapping)

    if options.output_dir:
        publish_json(df, options.output_dir)
    return df
