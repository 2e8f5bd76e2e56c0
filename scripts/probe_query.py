"""A/B measurement probe for single queries (optimization rounds).

Usage: python scripts/probe_query.py name [name ...] [--samples N]
       [--sf DIR]

For each named query, runs N noop-sink materializations in ONE session
and reports per-sample wall, best wall, job-group shuffle read/write
bytes of the final sample, and final-executed-plan node counts
(AQE-final, so runtime exchange reuse is visible — the initial plan
overstates scans when subtrees are reused). Interleaves queries
round-robin across samples so co-tenant drift hits all variants
equally.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from mission_data_pipeline_spark import get_spark  # noqa: E402
from mission_data_pipeline_spark.plans.queries import (  # noqa: E402
    QUERIES,
    register_views,
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    samples = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    if "--samples" in argv:
        samples = int(argv[argv.index("--samples") + 1])
        args.remove(str(samples))
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
        args.remove(sf_dir)
    names = args

    sys.path.insert(0, "/root/repo")
    from bench import _job_group_shuffle_bytes

    spark = get_spark(app_name="mdps-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)
    spark.table("lineitem").groupBy("l_returnflag").count().count()
    sc = spark.sparkContext

    walls: dict = {n: [] for n in names}
    bytes_: dict = {}
    plans: dict = {}
    for i in range(samples):
        for name in names:
            q = QUERIES[name]
            sc.setJobGroup(f"probe:{name}:{i}", name)
            t0 = time.time()
            df = q.spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            walls[name].append(time.time() - t0)
            bytes_[name] = _job_group_shuffle_bytes(
                spark, f"probe:{name}:{i}"
            )
            sc._jsc.clearJobGroup()
            if i == samples - 1:
                p = df._jdf.queryExecution().executedPlan().toString()
                plans[name] = {
                    "exchange": p.count("Exchange"),
                    "reused": p.count("ReusedExchange")
                    + p.count("(reuse"),
                    "scans": p.count("Scan parquet"),
                    "cached": p.count("Scan ExistingRDD"),
                    "chars": len(p),
                }
    for name in names:
        w = ", ".join(f"{x:.2f}" for x in walls[name])
        sb = bytes_[name] or {}
        pl = plans.get(name, {})
        print(
            f"{name}: walls=[{w}] best={min(walls[name]):.2f} "
            f"shuffle_r={sb.get('read', 0)/1e6:.1f}MB "
            f"shuffle_w={sb.get('write', 0)/1e6:.1f}MB plan={pl}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
