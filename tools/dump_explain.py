"""Dump `.explain("formatted")` for registry queries into plans/<tag>/,
including the plans of eagerly-materialized segments (localCheckpoint
runs its scan before the consumer plan exists, so the top-level explain
alone hides them).

Usage: python tools/dump_explain.py <tag> <query> [query ...] [sf_dir]
Writes plans/<tag>/<query>_<suffix>.txt  (suffix via --suffix=before|after)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sdc_spark.plans.all  # noqa: F401
from sdc_spark.materialize import start_plan_capture, stop_plan_capture
from sdc_spark.plans.registry import QUERIES
from sdc_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "before"
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    tag = args[0]
    sf_dir = "/root/testdata/sf0.1"
    names = []
    for a in args[1:]:
        if "/" in a:
            sf_dir = a
        else:
            names.append(a)

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_explain")
    for name in names:
        fn = QUERIES[name]
        cap = start_plan_capture()
        try:
            df = fn(spark, sf_dir)
            top = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        finally:
            stop_plan_capture()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} — top-level plan (formatted) ==\n")
            f.write(top)
            for i, seg in enumerate(cap):
                f.write(
                    f"\n\n== materialized segment {i + 1}/{len(cap)} "
                    "(executed eagerly before the top-level plan) ==\n"
                )
                f.write(seg)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
