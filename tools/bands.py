#!/usr/bin/env python3
"""Build per-query variance bands for the bench of record (round-10
VERDICT #2).

Input: one or more BENCH_DETAIL.json files (each carries the raw
pass1/pass2 maps of a full registry run under the bench protocol).
The unit of observation is the per-run MIN (matching the bench of
record's min-of-2); across runs we keep the min and max of those
observations plus the count.

Output: BENCH_BANDS.json — {"sf": ..., "runs": N, "bands":
{query: {"lo": s, "hi": s}}}. Bench.scala reads this file (env
SPARK_GRAFT_BENCH_BANDS) and flags any measured query outside
[lo/1.5 - 0.1, hi*1.3 + 0.2] so context-pressure drifts (the r7
d8/j15 / r8 d11,a22,m5 / r9 m2 ritual) are flagged by tooling at
measurement time instead of hand-bisected a round later.

Usage: python3 tools/bands.py out.json detail1.json detail2.json ...
"""
import json, sys
from pathlib import Path


def main():
    out = Path(sys.argv[1])
    details = [json.loads(Path(p).read_text()) for p in sys.argv[2:]]
    if not details:
        print(__doc__); sys.exit(2)
    sfs = {d.get("sf") for d in details}
    if len(sfs) != 1:
        sys.exit(f"refusing to band across scale factors: {sorted(sfs)}")
    obs = {}
    for d in details:
        passes = [d[k] for k in ("pass1", "pass2") if k in d]
        for q in passes[0]:
            obs.setdefault(q, []).append(min(p[q] for p in passes if q in p))
    bands = {q: {"lo": round(min(v), 3), "hi": round(max(v), 3)}
             for q, v in sorted(obs.items())}
    # compact one-line objects — Bench.scala parses {"hi":…,"lo":…}
    # with a regex, so no whitespace inside the per-query object
    out.write_text(json.dumps(
        {"sf": sfs.pop(), "runs": len(details), "bands": bands},
        separators=(",", ":"), sort_keys=True) + "\n")
    print(f"{len(bands)} bands from {len(details)} runs -> {out}")


if __name__ == "__main__":
    main()
