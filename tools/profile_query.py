"""Per-query profiler (guide §1): for each named registry query, run
warm best-of-3 noop-sink passes in ONE session with the UI enabled,
then dump (a) the wall, (b) a per-stage executorRunTime/shuffle
breakdown from the status-store REST API for the best pass, and
(c) ``explain('formatted')`` to ``plans/r14/<name>_<tag>.txt``.

Usage: python tools/profile_query.py [--tag before|after] [--sf DIR] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from institutional_fx_etl_spark import get_spark  # noqa: E402
from institutional_fx_etl_spark.plans import driver_queries  # noqa: E402


def _stages(spark) -> dict[int, dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        return {s["stageId"]: s for s in json.load(r)}


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15"))
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(
        app_name="profile", extra_conf={"spark.ui.enabled": "true"}
    )
    for name in names:
        fn = driver_queries.REGISTRY[name][0]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: WARMUP FAILED: {exc}")
            continue
        best, best_stages = float("inf"), {}
        for i in range(3):
            pre = _stages(spark)
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if dt < best:
                best = dt
                post = _stages(spark)
                best_stages = {k: v for k, v in post.items() if k not in pre}
        # plan capture (outside the timed region)
        plan = fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
            fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(f"# {name} @ {sf_dir}  wall(best-of-3)={best:.3f}s\n\n")
            f.write(plan)
        rows = sorted(
            best_stages.values(), key=lambda s: -s.get("executorRunTime", 0)
        )
        print(f"\n=== {name}: wall={best:.3f}s  stages={len(rows)}")
        for s in rows[:12]:
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>4}"
                f" execRun={s.get('executorRunTime', 0) / 1e3:7.2f}s"
                f" cpu={s.get('executorCpuTime', 0) / 1e9:7.2f}s"
                f" shufR={s.get('shuffleReadBytes', 0) / 1e6:8.2f}MB"
                f" shufW={s.get('shuffleWriteBytes', 0) / 1e6:8.2f}MB"
                f"  {s.get('description') or s.get('name', '')[:70]}"
            )


if __name__ == "__main__":
    main()
