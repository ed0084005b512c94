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
