#!/usr/bin/env python3
"""Dev-only comparator mimicking the driver's correctness gate:
run `sbt "runMain graft.Verify <sfDir> <outDir>"` first, then this script
runs each oracle_sql.json query in DuckDB over the same parquet tables and
compares value-sets column-sorted, like the driver does."""
import sys, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}")); continue
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        bad.append((name, f"spark output missing: {e}")); continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if sorted(exp.columns) != sorted(got.columns):
        bad.append((name, f"columns: spark={sorted(got.columns)} oracle={sorted(exp.columns)}")); continue
    if len(exp) != len(got):
        bad.append((name, f"rows: spark={len(got)} oracle={len(exp)}")); continue
    e2 = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    g2 = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    # normalize dtypes for compare
    for c in e2.columns:
        if e2[c].dtype != g2[c].dtype:
            try:
                e2[c] = e2[c].astype("float64"); g2[c] = g2[c].astype("float64")
            except Exception: pass
    try:
        pd.testing.assert_frame_equal(e2, g2, check_dtype=False, check_exact=True)
        ok.append(name)
    except AssertionError as err:
        bad.append((name, str(err).split("\n")[0] + " | " + str(err).split("\n")[-1]))
for n in ok: print(f"OK   {n}")
for n, m in bad: print(f"FAIL {n}: {m}")
rowsonly = [d.split('/')[-1] for d in glob.glob(f"{outdir}/*") if d.split('/')[-1] not in oracle and not d.endswith('.json')]
print("rows-only:", sorted(rowsonly))
sys.exit(1 if bad else 0)
