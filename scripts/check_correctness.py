"""Self-check every declared query against its DuckDB oracle.

Mirrors the driver's correctness gate: run the Spark plan and the oracle
SQL at sf0.01, normalize (sort columns by name, sort rows by all
columns), and require exact value equality. Stricter than a hash match —
if this passes, any reasonable hash normalization matches too.

Usage: python scripts/check_correctness.py [name ...] [--sf DIR] [--lint]
       [--perturb [--perturb-shuffle N] [--perturb-repartition M]]
       [--oracle-sample N]

``--oracle-sample N`` runs BOTH engines over a deterministic 1/N subset
of the ``documents`` table (seeded md5 bucket of doc_id — identical
membership in Spark and DuckDB by construction). This keeps the
heaviest document oracles (exact n-gram decontamination joins,
substring dedup) verifiable at probe scales where the full DuckDB
replay exceeds the box (the sfx100 bloom twin overran the 63 GB disk,
NOTES r10). The Spark side is still exercised shape-for-shape — only
the verified row population shrinks. Documents-only: other tables keep
their join consistency.

``--lint`` additionally runs the plan-shape linter (plans/lint.py) on
each query's executed plan and reports non-allowlisted anti-pattern
nodes as failures — the same sweep ``tests/test_plan_shape.py`` pins,
available here for one-off use on a subset or a different sf.

``--perturb`` is the partitioning-invariance sweep: after the default
run, each query re-executes under an adversarial layout
(``spark.sql.shuffle.partitions`` = an awkward prime, every input view
``.repartition()``-ed to a different prime) and the two result sets
must be EXACTLY equal. The engine's determinism engineering (quantized
BIGINT / DECIMAL accumulators, order-pinned windows, deterministic tie
breaks) claims cross-partition reproducibility; this makes the claim
machine-swept instead of per-operator asserted — a raw-double
cross-partition sum passes a single-layout oracle check by accident of
evaluation order and fails here. ``tests/test_partition_invariance.py``
seeds exactly that defect to prove the harness catches it.
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from mission_data_pipeline_spark import get_spark  # noqa: E402
from mission_data_pipeline_spark.sources.tables import TABLES  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            sample = df[c].dropna()
            # decimal.Decimal or similar from either engine → float
            if len(sample) and all(
                type(v).__name__ == "Decimal" for v in sample.head(5)
            ):
                df[c] = df[c].astype(float)
            # list/ndarray cells (array columns) → tuples so the
            # sort below can order them (ndarray is unhashable and
            # ambiguous under comparison)
            elif len(sample) and any(
                isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
                for v in sample.head(5)
            ):
                df[c] = df[c].map(
                    lambda v: tuple(v) if v is not None else None
                )
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s = _normalize(spark_df)
    d = _normalize(duck_df)
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, dv))
            if not _values_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(sv)} values differ; first at row {i}: "
                f"spark={a!r} ({type(a).__name__}) duck={b!r} ({type(b).__name__})"
            )
    return problems


def run_perturbed(
    spark,
    fn,
    sf_dir: str,
    *,
    shuffle_partitions: int = 7,
    input_repartition: int = 13,
) -> pd.DataFrame:
    """Execute one query under an adversarial layout and return pandas.

    Temporarily pins ``spark.sql.shuffle.partitions`` to an awkward
    value and re-keys every registered input view through
    ``.repartition(input_repartition)`` (plans.queries knob), then
    restores both. The combination changes every exchange's partition
    count AND the physical row order feeding every partial aggregate —
    the two degrees of freedom a layout-sensitive operator can leak.
    """
    from mission_data_pipeline_spark.plans import queries as qmod

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    qmod.set_input_repartition(input_repartition)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        return fn(spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        qmod.set_input_repartition(None)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--lint", action="store_true")
    ap.add_argument("--perturb", action="store_true")
    ap.add_argument("--perturb-shuffle", type=int, default=7)
    ap.add_argument("--perturb-repartition", type=int, default=13)
    ap.add_argument("--oracle-sample", type=int, default=None)
    ap.add_argument(
        "--oracle-sample-residue",
        type=int,
        default=0,
        help="which residue class mod --oracle-sample the subset keeps "
        "(round_gate.sh rotates this per round so successive sampled "
        "gates cover different 1/N document subsets)",
    )
    ap.add_argument(
        "--exclude",
        default="",
        help="comma-separated query names to skip (the round gate runs "
        "oracle-replay-heavy queries separately under --oracle-sample)",
    )
    args = ap.parse_args()
    lint_allow: dict[str, set[str]] = {}
    if args.lint:
        from mission_data_pipeline_spark.plans.lint import lint_plan  # noqa: F401

        sys.path.insert(0, "tests")
        from test_plan_shape import ALLOW as lint_allow  # noqa: E402

    qs = queries()
    oracles = oracle_sql()
    names = args.names or list(qs)
    if args.exclude:
        excluded = {n.strip() for n in args.exclude.split(",") if n.strip()}
        unknown = excluded - set(qs)
        if unknown:
            print(f"--exclude names not in the library: {sorted(unknown)}")
            return 2
        names = [n for n in names if n not in excluded]
        print(f"excluded {len(excluded)}: {sorted(excluded)}")

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if args.oracle_sample is not None:
        from mission_data_pipeline_spark.plans import queries as qmod

        qmod.set_input_sample(
            args.oracle_sample, residue=args.oracle_sample_residue
        )
        print(
            f"oracle-sample: documents restricted to deterministic "
            f"1/{args.oracle_sample} subset (residue "
            f"{args.oracle_sample_residue}) in BOTH engines"
        )
    con = duckdb.connect()
    for t in TABLES:
        pred = ""
        if t == "documents" and args.oracle_sample is not None:
            from mission_data_pipeline_spark.plans import queries as qmod

            pred = f" WHERE {qmod.input_sample_predicate_duckdb()}"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'{pred}"
        )

    n_pass = n_fail = n_noracle = 0
    failures: dict[str, list[str]] = {}
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            if args.lint:
                from mission_data_pipeline_spark.plans.lint import lint_plan

                plan = df._jdf.queryExecution().executedPlan().toString()
                hits = [
                    h
                    for h in lint_plan(plan)
                    if h.split(":", 1)[0] not in lint_allow.get(name, set())
                ]
                if hits:
                    n_fail += 1
                    failures[name] = [f"PLAN LINT: {h}" for h in hits]
                    print(f"FAIL  {name}: plan-shape lint")
                    continue
            sdf = df.toPandas()
        except Exception as e:
            n_fail += 1
            failures[name] = [f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"]
            print(f"FAIL  {name}: spark error")
            continue
        if name not in oracles:
            n_noracle += 1
            print(f"rows  {name}: {len(sdf)} rows (no oracle, rows-only check)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            failures[name] = [f"DUCKDB ERROR: {type(e).__name__}: {str(e)[:300]}"]
            print(f"FAIL  {name}: duckdb error")
            continue
        problems = compare(name, sdf, ddf)
        if not problems and args.perturb:
            try:
                pdf = run_perturbed(
                    spark,
                    qs[name],
                    args.sf,
                    shuffle_partitions=args.perturb_shuffle,
                    input_repartition=args.perturb_repartition,
                )
            except Exception as e:
                problems = [
                    f"PERTURBED SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"
                ]
            else:
                problems = [
                    f"LAYOUT: {p}" for p in compare(name, pdf, sdf)
                ]
        dt = time.time() - t0
        if problems:
            n_fail += 1
            failures[name] = problems
            print(f"FAIL  {name} ({dt:.1f}s)")
        else:
            n_pass += 1
            tag = " [+layout]" if args.perturb else ""
            print(f"pass  {name}: {len(sdf)} rows ({dt:.1f}s){tag}")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    for name, probs in failures.items():
        print(f"\n== {name}")
        for p in probs:
            print("  ", p)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
