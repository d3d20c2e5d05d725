#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]

1. sbt runMain graft.Verify <sfdir> <outdir>   (unless --skip-verify)
2. For each query: load <outdir>/<name> parquet, run the oracle SQL from
   oracle_sql.json in DuckDB against the sfdir parquet tables, compare
   row count, schema (columns sorted by name), and values.
"""
import json, subprocess, sys, math
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The driver's hasher is TYPED: a DuckDB HUGEINT (un-cast sum(BIGINT)) or
# DECIMAL column hash-fails against Spark's BIGINT/DOUBLE even when every
# value is identical. norm() below is blind to that (Python coerces to int),
# so lint the oracle's result types explicitly.
BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

# Oracle-vacuity guard (round-10; the x45 lesson generalized): a hash
# match on an EMPTY frame proves nothing — both engines can agree on an
# accidentally-degenerate result (x45's half-rotation pairing produced
# zero pairs at sf1 for a full round). Any query whose Spark result has
# zero rows FAILS unless it carries a documented legitimate-empty
# marker here. Keep this list empty-by-default: every entry needs a
# reason a human can audit.
EMPTY_OK = {
    # name: "reason this query is legitimately empty at some SF",
}

# Named per-SF oracle exceptions (round-12 VERDICT #2: the sf1 gate is
# the FULL registry; any query whose sf1 oracle is genuinely
# infeasible gets a written exception here instead of a silent
# omission). Keyed by sf-dir basename → {query: reason}.
ORACLE_SKIP = {
    "sf1": {
        "d5b_neardup_allpairs":
            "exact all-pairs oracle costs ~17 min at sf1 (2.4e8 "
            "list-lambda cosines over 22k vectors, measured round 11); "
            "d5's LSH-replay oracle covers sf1 and the two forms were "
            "verified row-identical at sf0.01/sf0.1/sf1 in round 11 — "
            "this row exists precisely to keep the all-pairs check "
            "automated at the CHEAP SFs (it runs at the sf0.01 driver "
            "gate every round)",
    },
}

def lint_types(duck):
    return [(c, str(t)) for c, t in zip(duck.columns, duck.types)
            if any(b in str(t).upper() for b in BAD_ORACLE_TYPES)]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)

def main():
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    if "--skip-verify" not in sys.argv:
        extra = " " + ",".join(sorted(only)) if only else ""
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{extra}'],
            capture_output=True, text=True, cwd="/root/repo")
        # [verify] failure lines are printed to stderr by Verify.scala —
        # scan BOTH streams or a per-query failure passes silently (the
        # missing output dir is simply never compared).
        sys.stdout.write("\n".join(
            l for l in (r.stdout + "\n" + r.stderr).splitlines()
            if "[verify]" in l or "error" in l.lower()) + "\n")
        if r.returncode != 0:
            print("VERIFY FAILED rc=%d" % r.returncode)
            print(r.stdout[-3000:]); print(r.stderr[-2000:])
            sys.exit(1)
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        # harness tables are single files; ScaleGen (SCALE.md) writes
        # Spark directory-parquet — glob the part files in that case
        src = (f"{SF}/{t}.parquet/*.parquet"
               if Path(f"{SF}/{t}.parquet").is_dir()
               else f"{SF}/{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    names = sorted(p.name for p in OUT.iterdir() if p.is_dir()
                   and (only is None or p.name in only))
    n_pass = n_fail = 0
    sf_name = Path(SF).name
    skips = ORACLE_SKIP.get(sf_name, {})
    results = {}        # name -> "pass" | "fail: ..." (for --json)
    t_start = __import__("time").time()

    def fail(name, msg):
        nonlocal n_fail
        print(f"FAIL {name}: {msg}")
        results[name] = f"fail: {msg[:160]}"
        n_fail += 1

    # a registered oracle whose query never wrote output is a FAILURE,
    # not a silent omission
    for missing in sorted(set(oracle) - set(names)):
        if missing in skips:
            continue
        fail(missing, "no spark output written (query threw?)")
    for name in names:
        if name in skips:
            print(f"SKIP {name}: [{sf_name} exception] {skips[name][:80]}...")
            results[name] = f"skip: {skips[name]}"
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetchall()
            spark_cols = [d[0] for d in con.sql(
                f"DESCRIBE SELECT * FROM '{OUT}/{name}/*.parquet'").fetchall()]
        except Exception as e:
            fail(name, f"cannot read spark result: {e}"); continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(spark_df)} rows)")
            continue
        t_q = __import__("time").time()
        try:
            duck = con.sql(oracle[name])
            duck_cols = duck.columns
            bad_types = lint_types(duck)
            duck_df = duck.fetchall()
        except Exception as e:
            fail(name, f"oracle SQL error: {str(e)[:200]}"); continue
        if bad_types:
            fail(name, f"oracle result type driver-hash-unsafe "
                 f"{bad_types} — CAST the column (e.g. AS BIGINT)")
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            fail(name, f"schema spark={sorted(spark_cols)} "
                 f"duck={sorted(duck_cols)}")
            continue
        # sort columns by name, then rows, then compare normalized values
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s_rows = sorted(tuple(norm(r[i]) for i in sidx) for r in spark_df)
        d_rows = sorted(tuple(norm(r[i]) for i in didx) for r in duck_df)
        if len(s_rows) != len(d_rows):
            fail(name, f"rows spark={len(s_rows)} duck={len(d_rows)}")
            continue
        if s_rows != d_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(f"  spark: {s_rows[bad]}")
            print(f"  duck:  {d_rows[bad]}")
            fail(name, f"values differ at sorted row {bad}")
            continue
        if len(s_rows) == 0 and name not in EMPTY_OK:
            fail(name, "VACUOUS — both engines agree on an empty frame, "
                 "which proves nothing (add an EMPTY_OK entry with a "
                 "reason if legitimately empty)")
            continue
        dt = __import__("time").time() - t_q
        print(f"PASS {name} ({len(s_rows)} rows, oracle {dt:.1f}s)")
        results[name] = f"pass ({len(s_rows)} rows, oracle {dt:.1f}s)"
        n_pass += 1
    total_s = __import__("time").time() - t_start
    print(f"\n{n_pass} passed, {n_fail} failed, {len(names)} total "
          f"(oracle wall {total_s:.0f}s)")
    if "--json" in sys.argv:
        out_path = Path(sys.argv[sys.argv.index("--json") + 1])
        out_path.write_text(json.dumps({
            "sf": sf_name, "n_pass": n_pass, "n_fail": n_fail,
            "n_skip": sum(1 for v in results.values()
                          if v.startswith("skip")),
            "oracle_wall_s": round(total_s, 1),
            "results": results}, indent=1) + "\n")
        print(f"wrote {out_path}")
    if n_fail:
        sys.exit(1)

if __name__ == "__main__":
    main()
