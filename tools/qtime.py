"""Ad-hoc per-query timing: python tools/qtime.py <sf_dir> <name> [name...]
Mirrors bench.py methodology: one shared session, warmup at sf0.001,
noop sink, median of 3 (all samples printed). Accepts any queries()
name plus the bench-only extras (dedup_minhash_lsh_fast).

Every line carries a frozen-canary BRACKET (probe before and after the
timed runs, tools/canary.py; r13 VERDICT #2) so a consumer — human or
sweep tool — can tell a steal-burst reading from a plan regression
without re-running. Disable with QTIME_CANARY=0."""
from __future__ import annotations

import os
import statistics
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from dbtransfer_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="qtime")
    qs = dict(entry.queries())
    from dbtransfer_spark.operators.dedup import dedup_minhash_lsh_fast

    qs["dedup_minhash_lsh_fast"] = dedup_minhash_lsh_fast
    from bench import _bench_incremental_release

    qs["incremental_release"] = _bench_incremental_release
    n = int(os.environ.get("QTIME_RUNS", "3"))
    warm_dir = os.environ.get("QTIME_WARM_DIR", "/root/testdata/sf0.001")
    use_canary = os.environ.get("QTIME_CANARY", "1") != "0"
    if use_canary:
        import canary

        canary.warm(spark)
    for name in names:
        fn = qs[name]
        if warm_dir:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        before = canary.probe(spark) if use_canary else None
        runs = []
        for _ in range(n):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
        after = canary.probe(spark) if use_canary else None
        bracket = f" canary=[{before},{after}]" if use_canary else ""
        print(
            f"{name}: median={statistics.median(runs)} runs={runs}{bracket}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
