"""Block until the sandbox is calm: N consecutive frozen-canary probes
(tools/canary.py) at or under the calm threshold, in a throwaway Spark
session. Used to gate bench runs so committed numbers carry a calm
canary stamp (r14 post2 discipline; r14 VERDICT #1).

Usage: python tools/calm_wait.py [consecutive=3] [max_wait_sec=1800]
Exits 0 once calm, 1 on timeout (the caller decides whether to proceed
and record the run as hot)."""
from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
sys.path.insert(0, os.path.join(_REPO_ROOT, "tools"))


def main() -> int:
    need = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    max_wait = float(sys.argv[2]) if len(sys.argv) > 2 else 1800.0
    import canary

    from dbtransfer_spark.session import get_spark

    spark = get_spark(app_name="calm-wait")
    canary.warm(spark)
    t0 = time.monotonic()
    streak = 0
    while time.monotonic() - t0 < max_wait:
        val = canary.probe(spark, runs=1)
        if val <= canary.CALM_SEC:
            streak += 1
            print(f"calm probe {streak}/{need}: {val}", flush=True)
            if streak >= need:
                print(f"CALM after {time.monotonic() - t0:.0f}s", flush=True)
                return 0
        else:
            if streak:
                print(f"streak reset by {val}", flush=True)
            streak = 0
            time.sleep(20)
        time.sleep(2)
    print(f"TIMEOUT still hot after {max_wait:.0f}s", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
