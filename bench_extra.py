"""Optimization-round measurement harness (guide §1) — NOT the frozen bench.

Mirrors bench.py's timed surface (build_run + query_run, the two numbers
summed into the headline ``value``) with extra instrumentation:

* per-gate wall time in the SAME dict order query_run uses (gate engine
  caches make timing order-sensitive);
* optional ``--plans DIR`` capture of ``explain("formatted")`` per gate;
* optional ``--only name1,name2`` subset (order preserved) for quick
  iteration — subset numbers are NOT comparable to full-run numbers for
  gates that share a cached engine with earlier gates;
* job descriptions per gate so the (disabled-by-default) UI would read.

Usage:
  python bench_extra.py                  # build + all gates, print JSON
  python bench_extra.py --no-build --plans plans/r06 --suffix _before
  python bench_extra.py --only bm25_topk_upserted,update_by_query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BUILD_ROWS = int(os.environ.get("SPARK_GRAFT_BUILD_ROWS", "100000"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-build", action="store_true")
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--only", default=None, help="comma list of gate names")
    ap.add_argument("--out", default=None, help="write JSON here too")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod

    result: dict = {"sf": SF_DIR, "cpus": CPUS}
    spark = bench.make_spark(CPUS)
    try:
        if not args.no_build:
            import tempfile

            tmp = tempfile.mkdtemp(prefix="hsbx_")
            result["build"] = bench.build_run(
                spark, BUILD_ROWS, f"{tmp}/main_idx"
            )
        gates = entrymod.queries()
        if args.only:
            keep = [s.strip() for s in args.only.split(",")]
            gates = {k: v for k, v in gates.items() if k in keep}
        times: dict = {}
        t_all = time.time()
        for name, fn in gates.items():
            spark.sparkContext.setJobDescription(f"gate:{name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            times[name] = round(time.time() - t0, 3)
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
                p = os.path.join(args.plans, f"{name}{args.suffix}.txt")
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception:
                    import contextlib
                    import io

                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    plan = buf.getvalue()
                with open(p, "w") as f:
                    f.write(f"# gate: {name}  rows={n}  sec={times[name]}\n")
                    f.write(plan)
            spark.sparkContext.setJobDescription(None)
        result["queries"] = times
        result["queries_seconds"] = round(time.time() - t_all, 3)
        if "build" in result:
            result["value"] = round(
                result["build"]["seconds"] + result["queries_seconds"], 3
            )
    finally:
        spark.stop()
    line = json.dumps(result, indent=1)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
