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
    python3 tools/pin_oracle.py /tmp/verify_r3 --reason "why the output changed" <name>...

AUDIT TRAIL (round-4 VERDICT #7): every (re)generation MUST name its
reason — the tool refuses to write otherwise — and appends one line per
pin to src/main/resources/graft/pins/CHANGELOG.tsv:
    <utc-date>\t<name>\t<sha256-of-pin-file>\t<reason>
graft.queries.PinAuditSpec asserts each committed pin's sha256 equals
its LATEST changelog entry, so a pin quietly re-captured (or hand-
edited) without a logged reason fails `sbt test`. The trail is what
lets a later round distinguish "regenerated deliberately for the
avg-pool change" from "re-captured to hide a regression".
"""
import datetime
import duckdb
import hashlib
import math
import os
import sys

PIN_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "src/main/resources/graft/pins")
CHANGELOG = os.path.join(PIN_DIR, "CHANGELOG.tsv")

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
    return path


def log_pin(name, path, reason):
    sha = hashlib.sha256(open(path, "rb").read()).hexdigest()
    date = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d")
    clean = reason.replace("\t", " ").replace("\n", " ").strip()
    with open(CHANGELOG, "a") as f:
        f.write(f"{date}\t{name}\t{sha}\t{clean}\n")


if __name__ == "__main__":
    args = sys.argv[1:]
    reason = None
    if "--reason" in args:
        i = args.index("--reason")
        # --reason as the LAST arg must hit the usage message below,
        # not an IndexError traceback
        reason = args[i + 1] if i + 1 < len(args) else None
        args = args[:i] + args[i + 2:]
    if not args or reason is None or not reason.strip():
        raise SystemExit(
            "usage: pin_oracle.py OUTDIR --reason 'why the output changed' NAME...\n"
            "refusing to (re)pin without a logged reason — the changelog is\n"
            "what lets a later round audit every pin regeneration (PinAuditSpec\n"
            "fails the build if a pin's hash has no matching changelog entry)")
    outdir, names = args[0], args[1:]
    if not names:
        raise SystemExit("no query names given")
    os.makedirs(PIN_DIR, exist_ok=True)
    for n in names:
        log_pin(n, pin(outdir, n), reason)
