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
    # a registered oracle whose query never wrote output is a FAILURE,
    # not a silent omission
    for missing in sorted(set(oracle) - set(names)):
        print(f"FAIL {missing}: no spark output written (query threw?)")
        n_fail += 1
    for name in names:
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetchall()
            spark_cols = [d[0] for d in con.sql(
                f"DESCRIBE SELECT * FROM '{OUT}/{name}/*.parquet'").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(spark_df)} rows)")
            continue
        try:
            duck = con.sql(oracle[name])
            duck_cols = duck.columns
            bad_types = lint_types(duck)
            duck_df = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1; continue
        if bad_types:
            print(f"FAIL {name}: oracle result type driver-hash-unsafe "
                  f"{bad_types} — CAST the column (e.g. AS BIGINT)")
            n_fail += 1; continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: schema spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1; continue
        # sort columns by name, then rows, then compare normalized values
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s_rows = sorted(tuple(norm(r[i]) for i in sidx) for r in spark_df)
        d_rows = sorted(tuple(norm(r[i]) for i in didx) for r in duck_df)
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1; continue
        if s_rows != d_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  spark: {s_rows[bad]}")
            print(f"  duck:  {d_rows[bad]}")
            n_fail += 1; continue
        if len(s_rows) == 0 and name not in EMPTY_OK:
            print(f"FAIL {name}: VACUOUS — both engines agree on an "
                  f"empty frame, which proves nothing (add an EMPTY_OK "
                  f"entry with a reason if legitimately empty)")
            n_fail += 1; continue
        print(f"PASS {name} ({len(s_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(names)} total")

if __name__ == "__main__":
    main()
