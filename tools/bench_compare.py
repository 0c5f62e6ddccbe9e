"""Compare two bench results with canary normalization.

Usage: python tools/bench_compare.py OLD.json NEW.json
       python tools/bench_compare.py --history OLD_TAG NEW_TAG

The second form reads the repo-committed BENCH_RUNS_LOCAL.json history
(appended by every bench.py run, keyed by $SPARK_GRAFT_BENCH_TAG and the
run's canary), so cross-round deltas stay reconstructible even when a
driver BENCH_r{N}.json stdout line was truncated (r7 VERDICT #5). A tag
matching several entries picks the newest; medians are recomputed from
raw runs for legacy entries that lack them.

The r6 post-mortem (VERDICT #2): BENCH_r06 read uniformly ~1.4× slower
than BENCH_r05 — trivial queries and ingest included — which was sandbox
drift, not plans, but nothing in the artifacts could prove it. bench.py
now emits ``canary_sec`` (a frozen, SF-independent CPU-bound aggregate);
this tool divides per-query deltas by the canary ratio so environment
drift cancels and only real plan deltas remain. Files without a canary
(pre-r7) compare raw, flagged as such.
"""

from __future__ import annotations

import json
import sys


def _from_history(tag: str) -> dict:
    import os
    import statistics

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_RUNS_LOCAL.json",
    )
    with open(path) as f:
        doc = json.load(f)
    entries = [e for e in doc.get("history", []) if e.get("tag") == tag]
    if not entries:
        known = sorted({e.get("tag") for e in doc.get("history", [])})
        raise SystemExit(f"tag {tag!r} not in history; known tags: {known}")
    e = entries[-1]  # newest wins
    if "queries" not in e and "runs" in e:  # legacy: medians from raw runs
        e = dict(e)
        e["queries"] = {
            q: round(statistics.median(r), 3) for q, r in e["runs"].items()
        }
        if e.get("canary_runs") and "canary_sec" not in e:
            e["canary_sec"] = round(statistics.median(e["canary_runs"]), 3)
    return e


def main() -> int:
    if len(sys.argv) == 4 and sys.argv[1] == "--history":
        old = _from_history(sys.argv[2])
        new = _from_history(sys.argv[3])
    elif len(sys.argv) == 3:
        old = json.load(open(sys.argv[1]))
        new = json.load(open(sys.argv[2]))
    else:
        print(__doc__)
        return 2
    # driver BENCH_r files nest the payload under "parsed" when present
    old = old.get("parsed") or old
    new = new.get("parsed") or new
    c_old, c_new = old.get("canary_sec"), new.get("canary_sec")
    env_ratio = (c_new / c_old) if (c_old and c_new) else None
    if env_ratio is None:
        print("NOTE: no canary in one/both files — raw comparison only")
    else:
        print(
            f"canary {c_old:.3f}s -> {c_new:.3f}s  (environment ratio "
            f"{env_ratio:.2f}x; per-query ratios below are divided by it)"
        )
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    print(f"{len(shared)} shared queries "
          f"({len(qn) - len(shared)} new, {len(qo) - len(shared)} dropped)")
    rows = []
    for q in shared:
        if not qo[q]:
            continue
        raw = qn[q] / qo[q]
        norm = raw / env_ratio if env_ratio else raw
        rows.append((norm, raw, q))
    rows.sort(reverse=True)
    print(f"{'query':38s} {'old_s':>7s} {'new_s':>7s} {'raw':>6s} {'norm':>6s}")
    for norm, raw, q in rows:
        print(f"{q:38s} {qo[q]:7.3f} {qn[q]:7.3f} {raw:5.2f}x {norm:5.2f}x")
    so = sum(qo[q] for _, _, q in rows)
    sn = sum(qn[q] for _, _, q in rows)
    agg = sn / so if so else float("nan")
    print(
        f"\nshared-set sum {so:.2f}s -> {sn:.2f}s  raw {agg:.2f}x"
        + (f"  normalized {agg / env_ratio:.2f}x" if env_ratio else "")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
