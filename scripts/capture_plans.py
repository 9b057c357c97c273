"""Capture .explain("formatted") for bench-suite queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query,query,...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $SDLT_PLAN_SUFFIX,
default "before"). Lifecycle-composite entries (vintage_merge,
ann_ivf_refresh, minhash_lsh_dedup_incremental) execute side-effecting
builds just to produce their final frame; their plan files describe the
RESULT frame, with a header noting the composite nature.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdlt_spark.session import get_spark  # noqa: E402
import sdlt_spark.queries as Q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COMPOSITES = {"vintage_merge", "ann_ivf_refresh", "minhash_lsh_dedup_incremental"}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = os.environ.get("SDLT_PLAN_SUFFIX", "before")
    if len(sys.argv) > 2:
        names = [q for q in sys.argv[2].split(",") if q]
    else:
        import bench

        names = list(bench.BENCH_QUERIES)
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("sdlt_plan_capture")
    registry = Q.registry()
    for name in names:
        fn, _sql = registry[name]
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            header = ""
            if name in COMPOSITES:
                header = (
                    "# lifecycle composite: the timed bench row includes "
                    "side-effecting build/merge jobs; this plan is the final "
                    "returned frame only.\n"
                )
            with open(path, "w") as fh:
                fh.write(header + buf.getvalue())
            print(f"captured {name} -> {path}")
        except Exception as exc:  # noqa: BLE001
            with open(path, "w") as fh:
                fh.write(f"# ERROR capturing plan: {exc!r}\n")
            print(f"ERROR {name}: {exc!r}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
