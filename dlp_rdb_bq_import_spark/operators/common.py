"""Shared operator plumbing.

``null_safe_group_join`` exists because the single most common silent
data-loss bug in per-group attach patterns is joining a grouped
aggregate back to its source with a plain equi-join: groupBy treats
NULL keys as a real group, but ``ON a.k = b.k`` never matches NULL, so
every NULL-keyed row vanishes from the output. Operators that promise
"returns the input plus …" must attach null-safely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_safe_group_join(
    base: DataFrame,
    agg_df: DataFrame,
    group_cols: list[str],
    broadcast: bool = True,
) -> DataFrame:
    """Inner-join ``agg_df`` (one row per group, carrying extra
    columns) onto ``base`` with NULL-SAFE key equality, returning
    base's columns plus agg_df's non-key columns. Because agg_df is a
    groupBy of base (or shares its key domain), null-safety makes the
    join lossless where a plain equi-join would drop NULL-keyed rows.

    ``broadcast=True`` marks the aggregate side broadcastable — the
    usual shape, since it is |groups|-sized.
    """
    aliases = {c: f"_nsg{i}" for i, c in enumerate(group_cols)}
    renamed = agg_df.withColumnsRenamed(aliases)
    cond = None
    for c, a in aliases.items():
        clause = base[c].eqNullSafe(renamed[a])
        cond = clause if cond is None else cond & clause
    right = F.broadcast(renamed) if broadcast else renamed
    return base.join(right, cond).drop(*aliases.values())


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: list[tuple[str, str]],
    n_salts: int = 32,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Skew-safe two-phase aggregation — the standard salting recipe
    for groupBy keys with mega-hot values (one host owning 30% of a
    crawl, one null-ish default owning half a column): phase 1 groups
    by (key, salt) so the hot key's rows spread over ``n_salts``
    reducers and combine into ``n_salts`` partials; phase 2 re-groups
    the |keys|·n_salts partial rows by key alone. The result is
    EXACTLY the plain groupBy (count/sum/min/max are associative-
    commutative semigroup folds — the only aggregates offered here;
    avg would need a sum/count decomposition the caller can state
    explicitly).

    ``aggs`` is a list of (input column, fn) pairs with fn one of
    ``count|sum|min|max`` (count ignores its column name per COUNT(*)
    semantics; output columns are ``n`` for count, ``fn_col``
    otherwise, so the same column may appear under min AND max). The
    salt comes
    from xxhash64 over ``salt_source`` (default: every non-group
    column) so it is deterministic and partitioning-independent — a
    random salt would make retried tasks non-idempotent.

    Spark's own partial aggregation already combines map-side, which
    handles MOST skew; explicit salting matters when a single key's
    post-combine partials still overwhelm one reducer (hundreds of
    thousands of input partitions × a hot key) or when AQE skew
    handling is unavailable mid-pipeline. This operator makes the
    pattern first-class instead of hand-rolled at call sites."""
    allowed = {"count", "sum", "min", "max"}
    bad = {how for _, how in aggs} - allowed
    if bad:
        raise ValueError(f"salted_aggregate: unsupported aggs {sorted(bad)}")
    if n_salts < 1:
        raise ValueError(f"salted_aggregate: n_salts must be >= 1, got {n_salts}")
    if "_salt" in df.columns:
        raise ValueError(
            "salted_aggregate: input column '_salt' collides with the "
            "reserved internal name; rename it before calling"
        )
    out_names = [f"{how}_{col}" if how != "count" else "n" for col, how in aggs]
    dupes = sorted({o for o in out_names if out_names.count(o) > 1})
    if dupes:
        raise ValueError(
            f"salted_aggregate: duplicate output aliases {dupes} — at most "
            "one count entry, and no repeated (col, fn) pair"
        )
    src = salt_source or [c for c in df.columns if c not in group_cols]
    if not src:
        raise ValueError(
            "salted_aggregate: no salt-source columns (group_cols cover "
            "the whole schema); pass salt_source explicitly"
        )
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(n_salts))
    )
    phase1 = []
    phase2 = []
    for col, how in aggs:
        out = f"{how}_{col}" if how != "count" else "n"
        if how == "count":
            phase1.append(F.count(F.lit(1)).alias(out))
            phase2.append(F.sum(out).cast("long").alias(out))
        elif how == "sum":
            phase1.append(F.sum(col).alias(out))
            phase2.append(F.sum(out).alias(out))
        elif how == "min":
            phase1.append(F.min(col).alias(out))
            phase2.append(F.min(out).alias(out))
        else:
            phase1.append(F.max(col).alias(out))
            phase2.append(F.max(out).alias(out))
    partials = salted.groupBy(*group_cols, "_salt").agg(*phase1)
    return partials.groupBy(*group_cols).agg(*phase2)
