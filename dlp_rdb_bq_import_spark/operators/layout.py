"""Data-layout operators: Z-order clustering for multi-dimensional scan
pruning.

At 100 TB the fastest scan is the one that never opens the file:
parquet readers skip whole files/row-groups whose min/max stats exclude
the predicate. A single-column sort gives tight stats on ONE column
only; interleaving the bits of several columns' bucket indices (the
Z-order / Morton curve) gives every clustered column *simultaneously*
tight ranges per file, so a conjunctive filter on any subset of the
clustered columns prunes most files. This is the same layout strategy
the open-source lakehouse formats expose as ``OPTIMIZE ... ZORDER BY``;
here it is plain DataFrame algebra: bucketize each column linearly
between its min/max, interleave bits JVM-side (shiftleft/or expression
tree, whole-stage codegen), range-partition by the resulting key, sort
within partitions, write.

Everything is deterministic bit math — the key computation hash-matches
a DuckDB oracle (``zorder_key`` gate query) and the pruning win is
asserted from real parquet footer statistics in tests.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import local_rows_df


def linear_bucket(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Value → bucket index in [0, 2^bits): linear binning between the
    column's min and max. Double math is IEEE-identical across engines,
    so the same expression in SQL yields the same buckets."""
    n = 1 << bits
    frac = (col.cast("double") - mn) * float(n) / (mx - mn + F.lit(1e-9))
    return F.least(F.floor(frac).cast("long"), F.lit(n - 1))


def interleave_bits(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of bucket i lands at position
    ``b * k + i``. A pure shiftleft/or expression tree — ``k * bits``
    terms, all inside codegen, no UDF."""
    k = len(buckets)
    terms = []
    for i, b in enumerate(buckets):
        for bit in range(bits):
            terms.append(F.shiftleft(F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * k + i))
    return functools.reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> DataFrame:
    """Append the Z-order key column ``_z`` computed from the data's own
    min/max per column (one tiny agg job; at 100 TB this is a metadata
    read for sorted sources, a single scan otherwise)."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_mx_{c}")]
    stats = df.agg(*aggs).first()
    for c in cols:
        if stats[f"_mn_{c}"] is None:
            raise ValueError(
                f"zorder_key: column {c!r} has no non-null values — "
                "it cannot contribute to a clustering key"
            )
    buckets = [
        # NULLs get bucket 0 explicitly (least() would otherwise slot
        # them at the TOP of the range, clustering them with the
        # largest values and silently degrading file pruning)
        F.when(
            F.col(c).isNull(), F.lit(0)
        ).otherwise(
            linear_bucket(
                F.col(c),
                F.lit(float(stats[f"_mn_{c}"])),
                F.lit(float(stats[f"_mx_{c}"])),
                bits,
            )
        )
        for c in cols
    ]
    return df.withColumn("_z", interleave_bits(buckets, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` Z-order-clustered on ``cols``: range-partition by
    the interleaved key (→ ``num_files`` files covering disjoint curve
    segments), sort within partitions (→ tight row-group stats inside
    each file), drop the key before writing. Readers filtering on any
    subset of ``cols`` then skip most files on footer stats alone."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def global_row_ids_and_total(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Dense global row ids 0..n-1 in ``order_cols`` order WITHOUT the
    single-partition trap.

    The naive ``row_number() OVER (ORDER BY ...)`` plans an empty
    PartitionBy window — Spark funnels the entire table through ONE
    task, which is a non-starter past a few GB. The scalable shape:

    1. range-partition by the order columns (sampled range exchange,
       the same primitive a global sort uses),
    2. one tiny job counts rows per partition → cumulative offsets
       (collect of #partitions longs, broadcast back),
    3. row_number WITHIN each partition (sorted locally) + offset.

    Order must be total (include a tiebreaker column) or ids within a
    tie are partition-placement-dependent. Two passes over the data —
    the price of determinism at scale; a monotonically_increasing_id
    is one pass but neither dense nor order-respecting.

    Returns ``(df_with_ids, total_rows)``: the offsets pass has
    already counted every row, so callers that need n (BH-FDR's m)
    must not pay a separate aggregate job — worse, an aggregate
    consumed via a broadcast DUPLICATES the whole ranked subtree into
    the broadcast build side (r14 measurement: 8 scans of the
    checkpoint in one plan; guide §1.2 — don't recompute what a paid
    job already knows).
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty (and a total order)")
    clash = sorted(set(df.columns) & {"_pid", "_off"})
    if clash:
        raise ValueError(
            f"global_row_ids: input columns {clash} collide with reserved "
            "internal names ['_off', '_pid']; rename them before calling"
        )
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    ranged = df.repartitionByRange(int(parts), *[F.col(c) for c in order_cols])
    # materialize ONCE: the range boundaries come from sampling, so the
    # offsets job and the numbering job must see the same physical
    # partitioning, not two independently sampled exchanges
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    sizes = {
        r["_pid"]: r["n"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = F.broadcast(
        local_rows_df(
            df.sparkSession, [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    out = (
        with_pid.join(off_df, "_pid")
        .withColumn(id_col, (F.row_number().over(w) - 1 + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
    return out, acc


def global_row_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """See :func:`global_row_ids_and_total` — same numbering, ids only."""
    return global_row_ids_and_total(df, order_cols, id_col, num_partitions)[0]


def prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    out_col: str = "prefix_sum",
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed running sum of ``weight_col`` in ``order_cols``
    order — :func:`global_row_ids` generalized from counting rows to
    summing a weight, WITHOUT the single-partition window trap.

    The naive ``sum(w) OVER (ORDER BY ...)`` plans an empty-PartitionBy
    window — one task sees every row, a non-starter once the ordered
    domain grows with the corpus (entity-grain aggregates: per-customer
    revenue, per-domain doc counts — Heaps'-law domains, unlike
    range-bounded raw measures). The scalable shape:

    1. range-partition by the order columns,
    2. one tiny job sums the weight per partition → cumulative offsets
       (collect of #partitions values, broadcast back),
    3. running sum WITHIN each partition + the partition's offset.

    ``exclusive=True`` yields the sum of STRICTLY-preceding weights
    (0 for the first row) — the rank-offset form Gini/Mann-Whitney
    style folds need; ``exclusive=False`` includes the current row.
    Offsets accumulate in Python ints (arbitrary precision) and land
    as decimal(38,0) so corpus-scale weights cannot wrap. Order must
    be total or in-tie prefixes are partition-placement-dependent."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty (and a total order)")
    clash = sorted(set(df.columns) & {"_pid", "_off"})
    if clash:
        raise ValueError(
            f"prefix_sums: input columns {clash} collide with reserved "
            "internal names ['_off', '_pid']; rename them before calling"
        )
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    ranged = df.repartitionByRange(int(parts), *[F.col(c) for c in order_cols])
    # materialize ONCE: range boundaries come from sampling, so the
    # offsets job and the summing job must see the SAME exchange
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    sizes = {
        r["_pid"]: r["s"]
        for r in with_pid.groupBy("_pid")
        .agg(F.sum(F.col(weight_col).cast("decimal(38,0)")).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += int(sizes[pid] or 0)
    off_df = F.broadcast(
        local_rows_df(
            df.sparkSession,
            [(pid, str(off)) for pid, off in offsets.items()],
            "_pid int, _off string",
        ).select("_pid", F.col("_off").cast("decimal(38,0)").alias("_off"))
    )
    upper = -1 if exclusive else 0
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    running = F.coalesce(
        F.sum(F.col(weight_col).cast("decimal(38,0)")).over(w),
        F.lit(0).cast("decimal(38,0)"),
    )
    return (
        with_pid.join(off_df, "_pid")
        .withColumn(out_col, (running + F.col("_off")).cast("decimal(38,0)"))
        .drop("_pid", "_off")
    )


def encode_categorical(
    df: DataFrame,
    col: str,
    code_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dictionary-encode a categorical column: dense integer codes
    0..|distinct|-1 in lexicographic value order (the vocabulary-build
    step of feature engineering — token→id, domain→id).

    Scalable composition: the distinct value set (the only part that
    needs a global order) goes through ``global_row_ids`` — range
    exchange + offsets, no SinglePartition window even for
    high-cardinality vocabularies — and the full table then picks up
    its code by an equi-join that AQE broadcasts when the vocabulary is
    small. The big table is never globally sorted.
    """
    code_col = code_col or f"{col}_code"
    vocab = global_row_ids(
        df.select(F.col(col)).where(F.col(col).isNotNull()).distinct(),
        [col],
        id_col=code_col,
        num_partitions=num_partitions,
    )
    return df.join(vocab, col, "left")


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: str = "",
    out: str = "shuffle_pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic pseudo-random training order: dense positions
    0..n-1 assigned by sorting on a keyed hash — the global shuffle a
    training run needs (i.i.d.-looking order, stable across re-runs,
    engines and cluster sizes; change ``seed`` per epoch for a fresh
    permutation). Built on :func:`global_row_ids`, so the order is
    realized with the scalable range-partition + per-partition
    numbering shape, never the single-partition global window. The
    key itself tiebreaks identical hashes (md5 collisions on the
    concatenated seed:key string), keeping the order total."""
    clash = sorted(set(df.columns) & {"_shufkey"})
    if clash:
        raise ValueError(
            "deterministic_shuffle: input column '_shufkey' collides with "
            "the reserved internal name; rename it before calling"
        )
    h = F.md5(
        F.concat(F.lit(str(seed)), F.lit(":"), F.col(key_col).cast("string"))
    )
    shuffled = global_row_ids(
        df.withColumn("_shufkey", h),
        ["_shufkey", key_col],
        id_col=out,
        num_partitions=num_partitions,
    )
    return shuffled.drop("_shufkey")


def balanced_file_layout(
    df: DataFrame,
    order_cols: list[str],
    rows_per_file: int,
    id_col: str = "row_id",
) -> DataFrame:
    """Write-side file planning: assign every row a target output file
    so files are (a) SIZED — exactly ``rows_per_file`` rows each
    except the last, no small-file shrapnel, no 10 GB stragglers —
    and (b) SORTED — file k holds the k-th contiguous slice of the
    ``order_cols`` order, so downstream range predicates prune whole
    files (the min/max footer statistics a sorted layout gives
    parquet). This is the compaction/layout decision every 100 TB
    table write needs and the naive ``row_number() OVER (ORDER BY
    ...)`` cannot provide past one task: file ids derive from the
    scalable dense row-id path (``global_row_ids``: sampled range
    exchange + per-partition offsets — no single-partition window).

    Output: the input rows + ``id_col`` + ``file_id`` (0-based,
    ``row_id div rows_per_file``). Callers either
    ``df.repartition('file_id').sortWithinPartitions(...)`` and write
    with one file per partition, or hand the plan to a compactor.
    """
    if rows_per_file < 1:
        raise ValueError(f"rows_per_file must be >= 1, got {rows_per_file}")
    ids = global_row_ids(df, order_cols, id_col=id_col)
    return ids.withColumn(
        "file_id",
        F.expr(f"CAST({id_col} div {int(rows_per_file)} AS BIGINT)"),
    )


def hilbert_key(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append a 2-D Hilbert-curve clustering key column ``_h`` (Hilbert
    1891; the xy→d bit transform as published in the public-domain
    Wikipedia/Warren formulation): like :func:`zorder_key` a
    space-filling-curve layout key for multi-dimensional file pruning,
    but with strictly better locality — every unit step along the
    Hilbert curve moves to an ADJACENT grid cell (Morton order jumps
    at power-of-two boundaries), so range scans over either dimension
    touch fewer files at the same grid resolution.

    Same contract as zorder_key: linear min/max bucketing to a
    2^bits × 2^bits grid (one tiny stats job; NULLs pin to bucket 0),
    then pure integer bit math — exact, engine-identical, restated
    verbatim in the SQL oracle. The per-level quadrant rotation runs
    as ``bits`` chained projections (NOT one nested expression: each
    level's (x, y) feed the next through a materialized select, which
    keeps Catalyst's analysis linear instead of exponential in
    ``bits`` — measured: the single-expression form never finishes
    analysis at bits=8).

    Two dimensions only (the rotation table is 2-D); for 3+ dims
    compose with zorder_key or bucket the extra dims separately."""
    if len(cols) != 2:
        raise ValueError(f"hilbert_key needs exactly 2 columns, got {cols}")
    if not 1 <= bits <= 15:
        raise ValueError(f"hilbert_key: bits must be in 1..15, got {bits}")
    reserved = {"_hx", "_hy", "_hd", "_h"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
        ]
    stats = df.agg(*aggs).first()
    for c in cols:
        if stats[f"_mn_{c}"] is None:
            raise ValueError(
                f"hilbert_key: column {c!r} has no non-null values — "
                "it cannot contribute to a clustering key"
            )
    buckets = [
        F.when(F.col(c).isNull(), F.lit(0)).otherwise(
            linear_bucket(
                F.col(c),
                F.lit(float(stats[f"_mn_{c}"])),
                F.lit(float(stats[f"_mx_{c}"])),
                bits,
            )
        )
        for c in cols
    ]
    orig = list(df.columns)
    staged = df.select(
        *orig,
        buckets[0].alias("_hx"),
        buckets[1].alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        x, y, d = F.col("_hx"), F.col("_hy"), F.col("_hd")
        rx = (x.bitwiseAND(F.lit(s)) > 0).cast("long")
        ry = (y.bitwiseAND(F.lit(s)) > 0).cast("long")
        nd = d + F.lit(s * s).cast("long") * (rx * 3).bitwiseXOR(ry)
        flip = (rx == 1) & (ry == 0)
        fx = F.when(flip, F.lit(s - 1) - x).otherwise(x)
        fy = F.when(flip, F.lit(s - 1) - y).otherwise(y)
        staged = staged.select(
            *orig,
            F.when(ry == 0, fy).otherwise(x).alias("_hx"),
            F.when(ry == 0, fx).otherwise(y).alias("_hy"),
            nd.alias("_hd"),
        )
    return staged.select(*orig, F.col("_hd").alias("_h"))


def hilbert_sql(base_select: str, x_expr: str, y_expr: str, bits: int = 8) -> str:
    """Oracle-side (DuckDB/ANSI) rendering of the :func:`hilbert_key`
    bit transform: the same per-level rotation as chained CTEs over a
    caller-provided ``base_select`` that must yield integer bucket
    columns ``{x_expr}``/``{y_expr}`` plus any passthrough columns.
    Returns CTE text ending in a relation ``hfinal(… , hd)``."""
    parts = [
        f"h{bits} AS (SELECT *, CAST({x_expr} AS BIGINT) AS hx, "
        f"CAST({y_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd "
        f"FROM ({base_select}))"
    ]
    lvl = bits
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        parts.append(
            f"h{k} AS (SELECT * EXCLUDE (hx, hy, hd),\n"
            f"  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END) ELSE hx END AS hx,\n"
            f"  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END) ELSE hy END AS hy,\n"
            f"  hd + {s * s} * xor(3 * {rx}, {ry}) AS hd\n"
            f"  FROM h{lvl})"
        )
        lvl = k
    parts.append(f"hfinal AS (SELECT * FROM h0)")
    return ",\n".join(parts)
