#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each SparkEntry query,
compare the Verify parquet dump against the oracle SQL run in DuckDB over the
same tables. Usage: oracle_check.py <sfDir> <verifyOutDir>
(Dev-harness only -- the library itself has no python dependency.)"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # driver-generated SFs are single files; ScaleUp corpora are Spark
    # parquet DIRECTORIES of part files — glob those
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fail = 0
summary = {}  # per-query verdicts, dumped to out_dir/summary.json
# Union of oracle entries and written outputs: a query that failed inside
# Verify (no parquet dir) must show as FAIL, not vanish from the comparison.
dirs = set(d for d in os.listdir(out_dir)
           if os.path.isdir(os.path.join(out_dir, d)))
names = sorted(dirs | set(oracle.keys()))
# GRAFT_ORACLE_ONLY=q_a,q_b: spot-check a subset (pairs with Verify's
# SPARK_GRAFT_ONLY, whose oracle_sql.json still lists every query)
only = os.environ.get("GRAFT_ORACLE_ONLY")
if only:
    keep = set(x.strip() for x in only.split(","))
    names = [n for n in names if n in keep]
for name in names:
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no parquet output"); fail += 1
        summary[name] = {"status": "FAIL", "err": "no parquet output"}
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    if name not in oracle:
        print(f"ok   {name}: rows-only ({len(got)} rows)")
        summary[name] = {"status": "ok", "rows": len(got), "rows_only": True}
        if len(got) == 0:
            print(f"WARN {name}: zero rows"); continue
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fail += 1
        summary[name] = {"status": "FAIL", "err": f"oracle sql error: {e}"}
        continue
    # driver semantics: sort columns by name, then compare values
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fail += 1
        summary[name] = {"status": "FAIL", "err": "column mismatch"}
        continue
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    if len(gs) != len(es):
        print(f"FAIL {name}: rows {len(gs)} != {len(es)}"); fail += 1
        summary[name] = {"status": "FAIL",
                         "err": f"rows {len(gs)} != {len(es)}"}
        continue
    try:
        pd.testing.assert_frame_equal(gs, es, check_dtype=False,
                                      check_exact=True)
        # The driver's hash is TYPE-sensitive (e.g. DuckDB HUGEINT vs Spark
        # BIGINT hash differently even when values match) — surface dtype
        # drift here so it can't slip past the local gate again.
        drift = [c for c in gs.columns if gs[c].dtype != es[c].dtype]
        if drift:
            print(f"WARN {name}: dtype drift (driver hash may fail): " +
                  ", ".join(f"{c} spark={gs[c].dtype} oracle={es[c].dtype}"
                            for c in drift))
        print(f"ok   {name}: {len(gs)} rows exact-match")
        summary[name] = {"status": "ok", "rows": len(gs),
                         "dtype_drift": drift}
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
        fail += 1
        summary[name] = {"status": "FAIL", "err": "value mismatch"}
with open(os.path.join(out_dir, "summary.json"), "w") as f:
    json.dump({"sf_dir": sf_dir, "pass": len(names) - fail,
               "total": len(names), "queries": summary}, f, indent=1)
print(f"{'PASS' if fail == 0 else 'FAIL'}: {len(names) - fail}/{len(names)}")
sys.exit(1 if fail else 0)
