#!/usr/bin/env python
"""Extra measurement harness for the optimization round (guide §1).

NOT part of the driver contract — bench.py stays frozen. This file
exists so per-query work can be measured in isolation:

  python bench_extra.py queries [names...]   # per-query count() timings
  python bench_extra.py noop [names...]      # noop-sink timings (§1.4)
  python bench_extra.py plans <tag> [names]  # dump explain("formatted")
                                             # to plans/r06/<q>_<tag>.txt

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))


def _spark():
    from spark_frontier.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run(mode: str, names: list[str]) -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    if not names:
        names = list(qs)
    spark = _spark()
    out: dict[str, object] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        if mode == "plans":
            tag = names[0] if names and names[0].startswith("_") else ""
            raise SystemExit("use plans_main")
        df = fn(spark, SF_DIR)
        # warm exactly like bench.py (plan + scan caches + JIT)
        df.count()
        walls = []
        for _ in range(REPS):
            df = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(walls), "all": walls}
        print(f"  {name}: min={min(walls)} all={walls}", flush=True)
    print("BENCHEXTRA " + json.dumps(
        {k: v["min"] for k, v in out.items()}, separators=(",", ":")))


def plans_main(tag: str, names: list[str]) -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    if not names:
        names = list(qs)
    spark = _spark()
    here = os.path.dirname(os.path.abspath(__file__))
    pdir = os.path.join(here, "plans", "r06")
    os.makedirs(pdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(pdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"  wrote {name}_{tag}.txt", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "plans":
        plans_main(sys.argv[2], sys.argv[3:])
    else:
        run(mode, sys.argv[2:])
