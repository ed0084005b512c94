#!/usr/bin/env python
"""Randomized differential testing of the SQL surface (VERDICT r13
task 3) — SQLancer's cross-engine + metamorphic oracles adapted to
this repo's Spark-vs-DuckDB gate.

The 365 hand-written oracles pin the operator library; what they cannot
catch is an optimizer-level wrong answer on a query shape nobody
hand-wrote. The reference delegates its entire ad-hoc query surface to
the warehouse engine (S7), so arbitrary-shape correctness IS the
remaining parity risk. Three oracles, seed-pinned so failures replay:

- DIFF  (cross-engine): a generated query in the Spark∩DuckDB dialect
  subset runs on both engines; canonicalized results must be identical.
  Grammar: filter-project / group-aggregate / FK equi-joins (inner and
  left) / set ops (UNION [ALL] / INTERSECT / EXCEPT), over predicates
  built from comparisons, BETWEEN, IN, LIKE, IS [NOT] NULL, AND/OR/NOT
  and integer CASE arithmetic. Doubles enter only through the repo's
  exact-integer quantization (CAST(ROUND(x*100) AS BIGINT)) or raw
  MIN/MAX — never an order-dependent float fold, so a value mismatch
  means a WRONG ANSWER, not float noise (SQLancer, Rigger & Su, "Testing
  Database Engines via Pivoted Query Synthesis", OSDI 2020).
- TLP   (Spark-only, metamorphic): for a random base query and
  predicate p, `Q` must equal `Q WHERE p ⊎ Q WHERE NOT p ⊎ Q WHERE p IS
  NULL` — ternary logic partitioning (Rigger & Su, ESEC/FSE 2020)
  catches predicate-pushdown/simplification bugs with no second engine.
- NOREC (Spark-only, metamorphic): `COUNT(*) WHERE p` must equal
  `SUM(CASE WHEN p THEN 1 ELSE 0 END)` — the non-optimizing form the
  optimizer cannot rewrite (Rigger & Su, ESEC/FSE 2020).

Usage:
    python tools/sql_fuzz.py [--sf DIR] [--n 12000] [--seed 14]
                             [--out artifact.json] [--replay I]

Every case i derives its own Random(f"{seed}:{i}"), so --replay I
regenerates exactly the failing query of a prior run.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlp_rdb_bq_import_spark import harness  # noqa: E402
from dlp_rdb_bq_import_spark.session import get_spark  # noqa: E402
from tools.compare_oracle import TABLES, canon, compare, duck_con  # noqa: E402

# embeddings holds array<float> — outside the scalar-SQL dialect subset
FUZZ_TABLES = [t for t in TABLES if t != "embeddings"]

# FK spine of the fixture schema (TPC-H-ish), used for join generation
FK_PAIRS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


class Schema:
    """Column-type classification + sampled literal pools per table."""

    def __init__(self, spark, con, sf_dir: str):
        self.cols: dict[str, dict[str, list[str]]] = {}
        self.pools: dict[tuple[str, str], list] = {}
        self.tables: list[str] = []
        for t in FUZZ_TABLES:
            if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
                continue
            df = harness.t(spark, sf_dir, t)
            df.createOrReplaceTempView(t)
            df.cache().count()
            kinds: dict[str, list[str]] = {"int": [], "dbl": [], "str": [], "ts": []}
            for f in df.schema.fields:
                n = f.dataType.typeName()
                if n in ("long", "integer", "short"):
                    kinds["int"].append(f.name)
                elif n in ("double", "float"):
                    kinds["dbl"].append(f.name)
                elif n == "string" and f.name != "text":
                    # `documents.text` is KB-sized prose: legal but it
                    # drowns the diff payloads; predicates still reach
                    # it via n_chars/lang/source
                    kinds["str"].append(f.name)
                elif n in ("timestamp", "date"):
                    kinds["ts"].append(f.name)
            self.cols[t] = kinds
            self.tables.append(t)
            for kind, names in kinds.items():
                for c in names:
                    rows = con.execute(
                        f"SELECT {c} FROM {t} WHERE {c} IS NOT NULL "
                        f"USING SAMPLE 40 ROWS"
                    ).fetchall()
                    self.pools[(t, c)] = [r[0] for r in rows]

    def pick_col(self, rng, t, kind):
        names = self.cols[t][kind]
        return rng.choice(names) if names else None


def _sql_str(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _sql_ts(v) -> str:
    return f"TIMESTAMP '{v.isoformat(sep=' ')}'"


class Gen:
    """Seed-pinned query generator over the common dialect subset."""

    def __init__(self, schema: Schema, rng: random.Random, prefix: str = ""):
        self.s = schema
        self.rng = rng
        self.prefix = prefix  # "a." / "b." qualification inside joins

    def lit(self, t, c, kind):
        pool = self.s.pools.get((t, c)) or []
        if not pool:
            return "0" if kind != "str" else "''"
        v = self.rng.choice(pool)
        if kind == "int":
            return str(int(v))
        if kind == "dbl":
            return str(int(round(v * 100)))  # quantized-int domain
        if kind == "ts":
            return _sql_ts(v)
        return _sql_str(v)

    def int_expr(self, t, depth=0) -> str:
        r = self.rng
        c_int = self.s.pick_col(r, t, "int")
        c_dbl = self.s.pick_col(r, t, "dbl")
        leaves = [str(r.randint(0, 1000))]
        if c_int:
            leaves.append(f"{self.prefix}{c_int}")
        if c_dbl:
            # doubles only through the exact integer quantization
            leaves.append(f"CAST(ROUND({self.prefix}{c_dbl} * 100) AS BIGINT)")
        if depth >= 2:
            return r.choice(leaves)
        roll = r.random()
        if roll < 0.45:
            return r.choice(leaves)
        if roll < 0.60:
            return f"({self.int_expr(t, depth + 1)} + {self.int_expr(t, depth + 1)})"
        if roll < 0.72:
            return f"({self.int_expr(t, depth + 1)} - {self.int_expr(t, depth + 1)})"
        if roll < 0.82:
            return f"({self.int_expr(t, depth + 1)} * {r.randint(2, 7)})"
        return (
            f"(CASE WHEN {self.pred(t, depth + 1)} "
            f"THEN {self.int_expr(t, depth + 1)} "
            f"ELSE {self.int_expr(t, depth + 1)} END)"
        )

    def pred(self, t, depth=0) -> str:
        r = self.rng
        if depth < 2:
            roll = r.random()
            if roll < 0.14:
                return f"(NOT {self.pred(t, depth + 1)})"
            if roll < 0.30:
                return f"({self.pred(t, depth + 1)} AND {self.pred(t, depth + 1)})"
            if roll < 0.46:
                return f"({self.pred(t, depth + 1)} OR {self.pred(t, depth + 1)})"
        kind = r.choice(["int", "int", "dbl", "str", "str", "ts"])
        c = self.s.pick_col(r, t, kind)
        if c is None:
            kind, c = "int", self.s.pick_col(r, t, "int")
        col = f"{self.prefix}{c}"
        if kind == "dbl":
            col = f"CAST(ROUND({col} * 100) AS BIGINT)"
        op = r.choice(["=", "<>", "<", "<=", ">", ">="])
        roll = r.random()
        if roll < 0.08:
            return f"({col} IS NULL)"
        if roll < 0.16:
            return f"({col} IS NOT NULL)"
        if kind in ("int", "dbl"):
            if roll < 0.30:
                lo, hi = sorted(
                    (self.lit(t, c, kind), self.lit(t, c, kind)),
                    key=lambda x: int(x),
                )
                return f"({col} BETWEEN {lo} AND {hi})"
            if roll < 0.44:
                vals = ", ".join(self.lit(t, c, kind) for _ in range(r.randint(2, 4)))
                return f"({col} IN ({vals}))"
            if roll < 0.56 and kind == "int":
                return f"({self.int_expr(t, 1)} {op} {self.int_expr(t, 1)})"
            return f"({col} {op} {self.lit(t, c, kind)})"
        if kind == "str":
            if roll < 0.35:
                pool = self.s.pools.get((t, c)) or [""]
                v = str(self.rng.choice(pool))
                frag = "".join(ch for ch in v[: r.randint(1, 4)] if ch.isalnum())
                pat = r.choice([f"{frag}%", f"%{frag}", f"%{frag}%"])
                return f"({col} LIKE '{pat}')"  # frag is alnum-only
            if roll < 0.50:
                vals = ", ".join(self.lit(t, c, "str") for _ in range(r.randint(2, 3)))
                return f"({col} IN ({vals}))"
            return f"({col} {op} {self.lit(t, c, 'str')})"
        return f"({col} {op} {self.lit(t, c, 'ts')})"

    def projection(self, t, n=None) -> list[str]:
        r = self.rng
        out = []
        for i in range(n or r.randint(1, 4)):
            roll = r.random()
            if roll < 0.45:
                kind = r.choice(["int", "str", "ts", "dbl"])
                c = self.s.pick_col(r, t, kind) or self.s.pick_col(r, t, "int")
                out.append(f"{self.prefix}{c} AS c{i}")
            elif roll < 0.75:
                out.append(f"{self.int_expr(t)} AS c{i}")
            else:
                c = self.s.pick_col(r, t, "str")
                if c:
                    fn = r.choice(["upper", "lower", "length"])
                    out.append(f"{fn}({self.prefix}{c}) AS c{i}")
                else:
                    out.append(f"{self.int_expr(t)} AS c{i}")
        return out

    def agg_select(self, t, group_max=2) -> str:
        r = self.rng
        n_group = r.randint(0, group_max)
        gcols, gsel = [], []
        for i in range(n_group):
            kind = r.choice(["int", "str", "str", "ts"])
            c = self.s.pick_col(r, t, kind) or self.s.pick_col(r, t, "str")
            if c is None:
                continue
            gcols.append(f"{self.prefix}{c}")
            gsel.append(f"{self.prefix}{c} AS g{i}")
        aggs = ["COUNT(*) AS cnt"]
        for j in range(r.randint(1, 3)):
            roll = r.random()
            if roll < 0.40:
                # CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas
                # renders float64 — the cast pins both engines to int64
                aggs.append(f"CAST(SUM({self.int_expr(t, 1)}) AS BIGINT) AS a{j}")
            elif roll < 0.65:
                kind = r.choice(["int", "dbl", "str", "ts"])
                c = self.s.pick_col(r, t, kind)
                if c:
                    fn = r.choice(["MIN", "MAX"])
                    aggs.append(f"{fn}({self.prefix}{c}) AS a{j}")
                else:
                    aggs.append(
                        f"CAST(SUM({self.int_expr(t, 1)}) AS BIGINT) AS a{j}"
                    )
            else:
                c = self.s.pick_col(r, t, r.choice(["int", "str"]))
                if c:
                    aggs.append(f"COUNT(DISTINCT {self.prefix}{c}) AS a{j}")
                else:
                    aggs.append(f"COUNT(*) AS a{j}")
        sel = ", ".join(gsel + aggs)
        group = f" GROUP BY {', '.join(gcols)}" if gcols else ""
        having = ""
        if gcols and r.random() < 0.3:
            having = f" HAVING COUNT(*) > {r.randint(0, 3)}"
        return sel, group, having


def gen_case(schema: Schema, seed: str, i: int) -> dict:
    """One seed-pinned test case: {"kind", "sql"...} ready to run."""
    rng = random.Random(f"{seed}:{i}")
    shape = rng.choices(
        ["filter", "agg", "join", "setop", "tlp", "norec"],
        weights=[22, 22, 18, 10, 16, 12],
    )[0]
    t = rng.choice(schema.tables)
    g = Gen(schema, rng)
    if shape == "filter":
        proj = ", ".join(g.projection(t))
        return {"kind": "diff", "shape": shape,
                "sql": f"SELECT {proj} FROM {t} WHERE {g.pred(t)}"}
    if shape == "agg":
        sel, group, having = g.agg_select(t)
        return {"kind": "diff", "shape": shape,
                "sql": f"SELECT {sel} FROM {t} WHERE {g.pred(t)}{group}{having}"}
    if shape == "join":
        pairs = [p for p in FK_PAIRS if p[0] in schema.tables and p[2] in schema.tables]
        lt, lk, rt, rk = rng.choice(pairs)
        jt = rng.choice(["JOIN", "JOIN", "LEFT JOIN"])
        ga = Gen(schema, rng, "a.")
        gb = Gen(schema, rng, "b.")
        on = f"a.{lk} = b.{rk}"
        where = f"{ga.pred(lt)}"
        if jt == "JOIN" and rng.random() < 0.6:
            where += f" AND {gb.pred(rt)}"
        if rng.random() < 0.5:
            proj = ", ".join(ga.projection(lt, 2))
            proj2 = ", ".join(
                p.replace(" AS c0", " AS d0").replace(" AS c1", " AS d1")
                for p in gb.projection(rt, 2)
            )
            sql = (f"SELECT {proj}, {proj2} FROM {lt} a {jt} {rt} b "
                   f"ON {on} WHERE {where}")
        else:
            sel, group, having = ga.agg_select(lt)
            sql = (f"SELECT {sel} FROM {lt} a {jt} {rt} b ON {on} "
                   f"WHERE {where}{group}{having}")
        return {"kind": "diff", "shape": shape, "sql": sql}
    if shape == "setop":
        proj = ", ".join(g.projection(t, rng.randint(1, 3)))
        op = rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
        sql = (f"SELECT {proj} FROM {t} WHERE {g.pred(t)} {op} "
               f"SELECT {proj} FROM {t} WHERE {g.pred(t)}")
        return {"kind": "diff", "shape": shape, "sql": sql}
    if shape == "tlp":
        proj = ", ".join(g.projection(t, rng.randint(1, 3)))
        p = g.pred(t)
        base = f"SELECT {proj} FROM {t}"
        parts = (f"{base} WHERE {p} UNION ALL {base} WHERE NOT ({p}) "
                 f"UNION ALL {base} WHERE ({p}) IS NULL")
        return {"kind": "tlp", "shape": shape, "sql": base, "sql2": parts}
    # norec
    p = g.pred(t)
    return {
        "kind": "norec", "shape": shape,
        "sql": f"SELECT COUNT(*) AS n FROM {t} WHERE {p}",
        "sql2": (f"SELECT COALESCE(SUM(CASE WHEN {p} THEN 1 ELSE 0 END), 0) "
                 f"AS n FROM {t}"),
    }


def run_case(spark, con, case: dict) -> list[str]:
    """Execute one case; [] = pass, else problem strings."""
    if case["kind"] == "diff":
        try:
            spdf = spark.sql(case["sql"]).toPandas()
        except Exception as e:
            return [f"spark error: {type(e).__name__}: {str(e).splitlines()[0][:200]}"]
        try:
            ddf = con.execute(case["sql"]).df()
        except Exception as e:
            return [f"duckdb error: {type(e).__name__}: {str(e).splitlines()[0][:200]}"]
        return compare("fuzz", spdf, ddf)
    if case["kind"] == "tlp":
        try:
            base = spark.sql(case["sql"]).toPandas()
            parts = spark.sql(case["sql2"]).toPandas()
        except Exception as e:
            return [f"spark error: {type(e).__name__}: {str(e).splitlines()[0][:200]}"]
        a, b = canon(base), canon(parts)
        if len(a) != len(b):
            return [f"TLP row count: base={len(a)} partitions={len(b)}"]
        if len(a) and not a.astype(str).equals(b.astype(str)):
            return ["TLP multiset mismatch"]
        return []
    # norec
    try:
        n1 = spark.sql(case["sql"]).collect()[0][0]
        n2 = spark.sql(case["sql2"]).collect()[0][0]
    except Exception as e:
        return [f"spark error: {type(e).__name__}: {str(e).splitlines()[0][:200]}"]
    return [] if int(n1) == int(n2) else [f"NoREC: count={n1} sum={n2}"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--n", type=int, default=12000)
    ap.add_argument("--seed", default="14")
    ap.add_argument("--out", default=None)
    ap.add_argument("--replay", type=int, default=None,
                    help="regenerate + run exactly case I, print its SQL")
    args = ap.parse_args()

    spark = get_spark(app_name="sql_fuzz")
    con = duck_con(args.sf)
    schema = Schema(spark, con, args.sf)

    if args.replay is not None:
        case = gen_case(schema, args.seed, args.replay)
        print(json.dumps(case, indent=1))
        probs = run_case(spark, con, case)
        print("PASS" if not probs else f"FAIL: {probs}")
        return 0 if not probs else 1

    t0 = time.time()
    shapes: dict[str, int] = {}
    errors: dict[str, int] = {}
    mismatches: list[dict] = []
    for i in range(args.n):
        case = gen_case(schema, args.seed, i)
        shapes[case["shape"]] = shapes.get(case["shape"], 0) + 1
        probs = run_case(spark, con, case)
        if probs:
            rec = {"i": i, "shape": case["shape"], "sql": case["sql"],
                   "sql2": case.get("sql2"), "problems": probs}
            mismatches.append(rec)
            print(f"FAIL case {i} [{case['shape']}]: {probs[0]}")
            print(f"      {case['sql'][:300]}")
            for p in probs:
                errors[p.split(":")[0]] = errors.get(p.split(":")[0], 0) + 1
        if (i + 1) % 500 == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f"# {i + 1}/{args.n} cases, {len(mismatches)} failures, "
                  f"{rate:.1f} case/s", file=sys.stderr)
    elapsed = round(time.time() - t0, 1)
    summary = {
        "seed": args.seed, "sf_dir": args.sf, "n_cases": args.n,
        "shapes": shapes, "n_mismatches": len(mismatches),
        "elapsed_sec": elapsed, "mismatches": mismatches[:50],
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "mismatches"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.out}")
    spark.stop()
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
