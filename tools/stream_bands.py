#!/usr/bin/env python3
"""Build STREAM_BANDS.json from >=2 same-protocol StreamBench JSON lines.

Usage: python3 tools/stream_bands.py run1.json run2.json run3.json \
         [--out STREAM_BANDS.json]

Each input file holds one {"metric":"stream_bench",...} line (the tool
greps for it, so a full run log works too). All runs must share the
protocol context (sf, reps, mode, state_store, state_parts) — the band
file carries that context and StreamBench disables the guard loudly on
any mismatch, so bands built for one protocol never flag another.

Band = [min, max] events_per_s per op over the runs. StreamBench flags
a run below lo/1.3 (drop) or above hi*1.5 (suspicious jump — an op that
stops doing work also "speeds up"; rows_out parity catches most of
those, this catches the rest).
"""
import json, sys
from pathlib import Path

CTX_KEYS = ["sf", "reps", "mode", "state_store", "state_parts"]


def load(path):
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric":"stream_bench"' in line:
            return json.loads(line)
    raise SystemExit(f"no stream_bench JSON line in {path}")


def main():
    out = "STREAM_BANDS.json"
    argv = sys.argv[1:]
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) < 2:
        raise SystemExit("need >=2 run files")
    runs = [load(a) for a in args]
    ctx = {k: runs[0].get(k) for k in CTX_KEYS}
    for r in runs[1:]:
        mism = {k: (ctx[k], r.get(k)) for k in CTX_KEYS
                if r.get(k) != ctx[k]}
        if mism:
            raise SystemExit(f"protocol mismatch across runs: {mism}")
    ops = {}
    for name in runs[0]["ops"]:
        evs = [r["ops"][name]["events_per_s"] for r in runs]
        ops[name] = {"lo": min(evs), "hi": max(evs)}
    band = dict(ctx)
    band["n_runs"] = len(runs)
    band["ops"] = ops
    # compact separators: StreamBench's band reader matches
    # "lo":<num> with no whitespace
    Path(out).write_text(json.dumps(band, separators=(",", ":")) + "\n")
    print(f"wrote {out}: {len(ops)} ops over {len(runs)} runs "
          f"({', '.join(f'{k}={v}' for k, v in ctx.items())})")


if __name__ == "__main__":
    main()
