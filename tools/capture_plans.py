"""Capture .explain("formatted") for headline (or named) queries into
plans/<tag>/<query>_<suffix>.txt — the judge-checkable record of plan
shape claims (guide §1: plan capture is part of measurement).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r14 before
Plans are captured against the bench's re-laid-out cache dir when it
exists (that is what bench.py times), else the raw sf dir.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    from bench import HEADLINE
    from dbtransfer_spark.session import get_spark

    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cache_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_CACHE_DIR", "/tmp/dbtransfer_cache"),
        os.path.basename(sf_dir.rstrip("/")),
    )
    plan_dir = cache_dir if os.path.isdir(cache_dir) else sf_dir

    spark = get_spark(app_name="capture-plans")
    qs = dict(entry.queries())
    from dbtransfer_spark.operators.dedup import dedup_minhash_lsh_fast

    qs["dedup_minhash_lsh_fast"] = dedup_minhash_lsh_fast
    if not names:
        # incremental_release / copurchase_edges_build execute pipelines at
        # build time; their plan story lives in their module docstrings.
        names = [
            n
            for n in HEADLINE
            if n not in ("incremental_release", "copurchase_edges_build")
        ]
    out_dir = os.path.join(_REPO_ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, plan_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure
            txt = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name}_{suffix}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
