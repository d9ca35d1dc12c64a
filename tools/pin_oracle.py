#!/usr/bin/env python3
"""Generate VALUES-pinned DuckDB oracle SQL from Verify output parquet.

For every query named on the command line, reads the Verify dump at
OUTDIR/<name>/*.parquet and writes
src/main/resources/graft/pins/<name>.sql — a self-contained
`SELECT ... FROM (VALUES ...)` statement that reproduces the output
byte-for-byte (explicit CASTs pin the column types). The Scala side
(graft.queries.PinnedOracles) ships these as the oracle for queries
whose semantics DuckDB cannot recompute (rule extraction, LSH, CC,
codecs): the pin turns the driver's `no_oracle` rows into hard
rows+schema+hash checks, so ANY output change flips red.

Only valid for queries whose output is deterministic and
parallelism-independent (all kg*/s*/t07 registered ones are — see each
query's scaladoc). Regenerate after any intended output change:

    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r3"
    python3 tools/pin_oracle.py /tmp/verify_r3 <name>...
"""
import duckdb
import math
import os
import sys

PIN_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "src/main/resources/graft/pins")

# duckdb type name -> literal renderer
def render(v, typ):
    if v is None:
        return "NULL"
    t = typ.upper()
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
             "UBIGINT", "UINTEGER"):
        return str(int(v))
    if t == "DOUBLE" or t == "FLOAT":
        f = float(v)
        if math.isnan(f):
            return "CAST('nan' AS DOUBLE)"
        if math.isinf(f):  # repr() would emit a bare non-SQL 'inf' token
            return f"CAST('{'infinity' if f > 0 else '-infinity'}' AS DOUBLE)"
        return repr(f)  # round-trips exactly
    if t == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if t == "DATE":
        return f"DATE '{v}'"
    if t == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    raise SystemExit(f"unsupported type {typ} for pinning (value {v!r})")


def pin(outdir, name):
    con = duckdb.connect()
    src = f"SELECT * FROM '{outdir}/{name}/*.parquet'"
    # DESCRIBE for real SQL types (the DB-API cursor description only
    # carries generic NUMBER/STRING names)
    cols = [(r[0], r[1]) for r in con.execute(f"DESCRIBE {src}").fetchall()]
    rows = con.execute(src).fetchall()
    if not rows:
        raise SystemExit(f"{name}: empty output, refusing to pin")
    for c, t in cols:
        if t.upper() not in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                             "DOUBLE", "FLOAT", "BOOLEAN", "DATE", "VARCHAR"):
            raise SystemExit(f"{name}: column {c} has unpinnable type {t}")
    # identifiers double-quoted: column names like "abstract" collide
    # with keywords otherwise
    sel = ", ".join(f'CAST("{c}" AS {t}) AS "{c}"' for c, t in cols)
    names = ", ".join(f'"{c}"' for c, _ in cols)
    values = ",\n".join(
        "  (" + ", ".join(render(v, t) for v, (_, t) in zip(r, cols)) + ")"
        for r in rows)
    sql = (f"SELECT {sel}\nFROM (VALUES\n{values}\n) AS t({names})\n"
           f"ORDER BY {names}")
    path = os.path.join(PIN_DIR, f"{name}.sql")
    with open(path, "w") as f:
        f.write(sql + "\n")
    print(f"pinned {name}: {len(rows)} rows x {len(cols)} cols "
          f"-> {os.path.relpath(path)} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    outdir, names = sys.argv[1], sys.argv[2:]
    os.makedirs(PIN_DIR, exist_ok=True)
    for n in names:
        pin(outdir, n)
