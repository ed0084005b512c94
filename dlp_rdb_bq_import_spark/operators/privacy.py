"""Privacy risk measurement over tabular data: k-anonymity and
l-diversity reports — the assessment side of the reference's DLP
domain (the reference transforms values via DLP templates,
DLPTokenizationDoFn.java:66-159, but never MEASURES re-identification
risk; these are the standard public metrics, Sweeney 2002 /
Machanavajjhala et al. 2007, that tell you whether tokenization or
generalization is needed at all).

Scale shape: both metrics are ONE partial-aggregated groupBy over the
quasi-identifier tuple (plus count_distinct for l-diversity) — the
equivalence-class table is |distinct QI combinations|-sized, orders of
magnitude smaller than the data, and everything downstream of the
aggregation is arithmetic on that small table. No joins, no windows,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Equivalence classes of the quasi-identifier tuple with their
    sizes and an ``at_risk`` flag (class smaller than ``k`` — those
    rows are re-identifiable by joining the QI columns with an external
    dataset; k-anonymity holds iff no class is at risk).

    Output: ``quasi_cols…, class_size (long), at_risk (long 0/1)``.
    NULL quasi-identifier values form their own classes (groupBy
    semantics), which is the conservative reading: an absent value is
    itself identifying.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    reserved = {"class_size", "at_risk"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("class_size")
    ).select(
        *quasi_cols,
        "class_size",
        (F.col("class_size") < k).cast("long").alias("at_risk"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Distinct l-diversity per equivalence class: a class where the
    sensitive attribute takes fewer than ``l`` distinct values leaks it
    even when k-anonymity holds (everyone in the class shares the
    secret — the homogeneity attack).

    Output: ``quasi_cols…, class_size (long), distinct_sensitive
    (long), diverse (long 0/1)``. NULL sensitive values do not count
    toward diversity (count_distinct skips them): a class of all-NULL
    sensitive values has diversity 0.
    """
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    reserved = {"class_size", "distinct_sensitive", "diverse"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).cast("long").alias(
            "distinct_sensitive"
        ),
    ).select(
        *quasi_cols,
        "class_size",
        "distinct_sensitive",
        (F.col("distinct_sensitive") >= l).cast("long").alias("diverse"),
    )
