#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each query's
parquet dump (written by graft.Verify), run the matching oracle SQL in
DuckDB over the same sf dir, canonicalize (sort columns by name, sort
rows, render values) and compare. Usage: check.py <sfdir> <outdir>"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): vals.append("NaN")
                else: vals.append(repr(v))
            else: vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out

ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        got = canon(got_rel.fetchall(), got_rel.columns)
        exp_rel = con.sql(sql)
        # Guard: the driver's canonicalizer renders HUGEINT/uncast-DECIMAL
        # differently than BIGINT/DOUBLE (bit us in r1 decimal, r2 NTZ, r5
        # HUGEINT). Fail loudly here so an uncast SUM() never reaches the
        # driver.
        bad_types = [(c, str(t)) for c, t in zip(exp_rel.columns, exp_rel.types)
                     if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()]
        if bad_types:
            print(f"FAIL {name}: oracle result has driver-unsafe types {bad_types}"
                  f" — CAST to BIGINT/DOUBLE in the oracle SQL")
            fail += 1
            continue
        exp = canon(exp_rel.fetchall(), exp_rel.columns)
        if sorted(got_rel.columns) != sorted(exp_rel.columns):
            print(f"FAIL {name}: columns {sorted(got_rel.columns)} vs {sorted(exp_rel.columns)}")
            fail += 1
        elif got == exp:
            print(f"ok   {name} ({len(got)} rows)")
            ok += 1
        else:
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows")
            diff = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            for g, e in diff:
                print(f"   got: {g[:160]}\n   exp: {e[:160]}")
            only_got = set(got) - set(exp)
            only_exp = set(exp) - set(got)
            for x in list(only_got)[:2]: print(f"   only-got: {x[:160]}")
            for x in list(only_exp)[:2]: print(f"   only-exp: {x[:160]}")
            fail += 1
    except Exception as ex:
        print(f"ERROR {name}: {ex}")
        fail += 1
print(f"\n{ok} ok, {fail} fail, {len(oracle)} total")
sys.exit(1 if fail else 0)
