#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare: for each query
output parquet under OUTDIR, run the oracle SQL from oracle_sql.json in
DuckDB over the same sf tables and compare (rows, schema names, values).
Values are compared column-name-sorted, row-sorted, with float tolerance.
"""
import duckdb, json, sys, math, os
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

fails = 0
enc_warns = []
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
        exp = con.execute(sql).fetchdf()
        # Encoding-faithfulness check (round-5 VERDICT "What's wrong"
        # #3): the driver's comparator hashes value ENCODINGS, so a
        # DuckDB output column that arrives as HUGEINT/decimal128
        # (e.g. an uncast integer sum()) hash-fails against Spark's
        # BIGINT even when every value matches — and the value compare
        # below cannot see it. Surface it loudly. It is a WARNING, not
        # a failure, while the two known-affected oracles (t16/t17)
        # are measurement-frozen; once their CAST(... AS BIGINT) fix
        # lands in a build round, flip this to a hard failure.
        try:
            hug = [d[0] for d in con.execute(f"DESCRIBE {sql}").fetchall()
                   if d[1].upper().startswith(("HUGEINT", "DECIMAL"))]
        except Exception:
            hug = []  # DESCRIBE rejects some set-op shapes; warning-only
        if hug:
            enc_warns.append((name, hug))
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: schema {gc} vs {ec}")
        fails += 1
        continue
    got = got[gc].sort_values(gc).reset_index(drop=True)
    exp = exp[ec].sort_values(ec).reset_index(drop=True)
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fails += 1
        continue
    ok = True
    for c in gc:
        a, b = got[c], exp[c]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            bad = [(x, y) for x, y in zip(a, b)
                   if not (x == y or (isinstance(x, float) and isinstance(y, float)
                                      and (math.isnan(x) and math.isnan(y)
                                           or abs(x - y) <= 1e-9 * max(1, abs(x), abs(y))))) ]
        else:
            bad = [(x, y) for x, y in zip(a.astype(str), b.astype(str)) if x != y]
        if bad:
            print(f"FAIL {name}: col {c} first diffs {bad[:3]}")
            ok = False
            fails += 1
            break
    if ok:
        print(f"OK   {name}: {len(got)} rows")
for name, cols in enc_warns:
    print(f"ENCODING-WARN {name}: DuckDB emits HUGEINT/DECIMAL for {cols} — "
          "values may match while the driver's encoding-sensitive hash fails "
          "(cast to BIGINT/DOUBLE in the oracle once it is unfrozen)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
