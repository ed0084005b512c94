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


# --- free-text PII scrubbing (training-corpus redaction) -------------------
# The free-text counterpart of the reference's structured-field DLP
# transforms (DLPTokenizationDoFn.java:66-159 deidentifies RDB column
# VALUES through templates; a web-scale TRAINING corpus instead needs
# irreversible in-text redaction — the scrub pass public corpora apply
# before release). Patterns are the RE2-compatible subset (no
# lookaround — word boundaries instead), so the identical regex runs
# in Spark (Java) and any RE2 engine, and the whole scrub is a chain
# of JVM-side regexp_replace/regexp_extract_all calls: zero UDFs, a
# pure map over the corpus.
#
# ORDER MATTERS and is part of the contract: each type counts and
# replaces on the PREVIOUS type's output, so an email's digits are
# never also counted as a phone, and a 16-digit card is consumed
# before the 3-3-4 phone pattern could match inside it. Placeholders
# contain no digits, so later patterns never match inside them.
PII_PATTERNS: dict[str, str] = {
    "EMAIL_ADDRESS": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IPV4_ADDRESS": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "CREDIT_CARD": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "SSN_US": r"\b\d{3}-\d{2}-\d{4}\b",
    "PHONE_NUMBER": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}


def scrub_pii(
    df: DataFrame,
    text_col: str,
    info_types: tuple[str, ...] | None = None,
) -> DataFrame:
    """Redact PII from a free-text column: each configured info type
    is counted then replaced with its typed placeholder
    (``[EMAIL_ADDRESS]`` …), in the fixed documented order. Adds
    ``n_<type>`` (long) per type, ``n_pii`` (total), and replaces
    ``text_col`` with the scrubbed text. Irreversible by design — the
    training-data path wants the PII GONE, not format-preserved (the
    reversible path is functions/tokenize.py's FPE pipeline).

    Scale shape: a pure per-row expression chain (regexp count +
    replace per type) — no shuffle, no UDF, whole-stage codegen; at
    100 TB this fuses into whatever scan feeds it.
    """
    types = tuple(info_types) if info_types is not None else tuple(PII_PATTERNS)
    bad = [t for t in types if t not in PII_PATTERNS]
    if bad or not types:
        raise ValueError(
            f"info_types must be a non-empty subset of "
            f"{tuple(PII_PATTERNS)}; got {types}"
        )
    # preserve the canonical order regardless of caller order — the
    # count/replace cascade is only well-defined in one order
    types = tuple(t for t in PII_PATTERNS if t in types)
    cur = F.col(text_col)
    counts = []
    out_cols = [c for c in df.columns if c != text_col]
    for t in types:
        pat = PII_PATTERNS[t]
        n = F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).cast("long")
        counts.append((f"n_{t.lower()}", n))
        cur = F.regexp_replace(cur, pat, f"[{t}]")
    total = counts[0][1]
    for _, n in counts[1:]:
        total = total + n
    return df.select(
        *out_cols,
        cur.alias(text_col),
        *[n.alias(name) for name, n in counts],
        total.alias("n_pii"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness per equivalence class (Li, Li & Venkatasubramanian,
    ICDE 2007 — the third rung of the k-anonymity ladder): a class
    whose SENSITIVE-value distribution sits far from the global
    distribution leaks information even when it is k-anonymous AND
    l-diverse (skewness attack: "everyone in this class is 10× more
    likely to have X"). Distance here is total variation
    ``½·Σ_v |q_v − p_v|`` — the paper's categorical-attribute choice;
    for ordered domains compose with quantile_binning first and read
    the bins as categories (the EMD variant is the rank-cumulative
    extension of the same grid).

    Output: ``quasi_cols…, class_size (long), tvd (double), close
    (long 0/1 — tvd ≤ t)``. NULL sensitive values are excluded from
    both distributions (same convention as l-diversity); NULL QI
    values form their own classes (conservative, as in k-anonymity).

    Exactness: with exact integer counts, ``q_v − p_v =
    (c_v·N − g_v·n) / (n·N)`` — the numerators are computed in
    DECIMAL(38,0) (int64 would silently wrap once n·N passes 2^63,
    which happens beyond ~3e9 rows — exactly the scale this repo
    advertises), so ``tvd = Σ|c_v·N − g_v·n| / (2·n·N)`` is ONE IEEE
    division of exact integers (rounded to 9): bit-identical in any
    engine, no per-term float accumulation.

    Shape: a |classes|×|values| grid (classes cross-join the
    broadcast value spine, left-join per-class counts) — the right
    shape for the LOW-cardinality sensitive domains t-closeness is
    defined over; one groupBy folds the grid back to classes."""
    if not 0.0 < t <= 1.0:
        raise ValueError(f"t_closeness_report: t must be in (0,1], got {t}")
    reserved = {"class_size", "tvd", "close", "_g", "_c", "_n", "_tot", "_v"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with reserved names: {sorted(clash)}"
        )
    base = df.where(F.col(sensitive_col).isNotNull())
    spine = (
        base.groupBy(F.col(sensitive_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_g"))
    )
    total = spine.agg(F.sum("_g").alias("_tot"))
    classes = base.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    counts = base.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_c"))
    # null-safe QI equality: a NULL QI value is its own class and must
    # pair with its own counts, not vanish through a plain equi-join
    renames = {c: f"_q{i}" for i, c in enumerate(quasi_cols)}
    counts_r = counts.withColumnsRenamed({**renames, "_v": "_v2"})
    cgrid = classes.crossJoin(F.broadcast(spine))
    cond = cgrid["_v"] == counts_r["_v2"]
    for c, a in renames.items():
        cond = cond & cgrid[c].eqNullSafe(counts_r[a])
    grid = (
        cgrid.join(counts_r, cond, "left")
        .crossJoin(F.broadcast(total))
        .select(
            *[cgrid[c] for c in quasi_cols],
            "_n",
            "_tot",
            F.abs(
                F.coalesce(F.col("_c"), F.lit(0)).cast("decimal(38,0)")
                * F.col("_tot").cast("decimal(38,0)")
                - F.col("_g").cast("decimal(38,0)")
                * F.col("_n").cast("decimal(38,0)")
            ).alias("_absnum"),
        )
    )
    tvd = F.col("_sum").cast("double") / (
        F.lit(2.0)
        * (
            F.col("_n").cast("decimal(38,0)") * F.col("_tot").cast("decimal(38,0)")
        ).cast("double")
    )
    return (
        grid.groupBy(*quasi_cols, "_n", "_tot")
        .agg(F.sum("_absnum").alias("_sum"))
        .select(
            *quasi_cols,
            F.col("_n").cast("long").alias("class_size"),
            F.round(tvd, 9).alias("tvd"),
            (F.round(tvd, 9) <= F.lit(float(t))).cast("long").alias("close"),
        )
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dp",
    out: str = "noisy_n",
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism
    (Dwork et al., TCC 2006 — the canonical DP release for counting
    queries; a unit-sensitivity count gets Laplace(1/ε) noise). The
    k/l/t-family above AUDITS a table's re-identification risk; this
    operator is the other half of the privacy surface — releasing an
    aggregate under a formal guarantee instead of reporting on it.

    Noise is DETERMINISTIC-SEEDED: the Laplace draw comes from the
    inverse CDF ``-(1/ε)·sign(u−½)·ln(1−2|u−½|)`` applied to the
    engine's standard md5 uniform (sampling.hash_uniform) over
    ``seed || group key`` — retried tasks and both oracle engines
    produce the SAME noise (a ``rand()`` draw would make the release
    non-idempotent under Spark task retry, silently spending extra ε).
    One seed = one release; a NEW release must use a new seed and
    accounts for its own ε (composition is the caller's budget,
    documented not enforced). NULL group keys form their own group
    (render as the string 'NULL' in the noise key, distinct from the
    literal).

    Output: ``group_cols…, noisy_n (double, rounded to 9)``. The true
    count never leaves the operator. Shape: ONE groupBy + expression
    noise — aggregate-sized at any corpus scale."""
    if epsilon <= 0:
        raise ValueError(f"dp_noisy_counts: epsilon must be > 0, got {epsilon}")
    if not group_cols:
        raise ValueError("dp_noisy_counts: need >= 1 group column")
    if out in group_cols:
        raise ValueError(f"dp_noisy_counts: output column {out!r} collides")
    from .sampling import hash_uniform

    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    key = F.concat_ws(
        "|",
        F.lit(seed),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
            for c in group_cols
        ],
    )
    u = hash_uniform(key)
    centered = u - F.lit(0.5)
    sign = F.when(centered < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    noise = (
        F.lit(-1.0 / float(epsilon))
        * sign
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        *group_cols,
        F.round(F.col("_n").cast("double") + noise, 9).alias(out),
    )


def dp_noise_sql(key_expr: str, epsilon: float) -> str:
    """Oracle-side rendering of the deterministic Laplace draw —
    MUST mirror :func:`dp_noisy_counts` op for op."""
    from .sampling import hash_uniform_sql

    u = hash_uniform_sql(key_expr)
    return (
        f"({-1.0 / float(epsilon)!r}) * "
        f"(CASE WHEN ({u}) - 0.5 < 0 THEN -1.0 ELSE 1.0 END) * "
        f"ln(1.0 - 2.0 * abs(({u}) - 0.5))"
    )
