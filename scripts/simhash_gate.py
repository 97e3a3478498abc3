#!/usr/bin/env python3
"""Memoized simhash oracle gate for the d03 pair view at scale.

d03_simhash's oracle recomputes the 60-bit simhash from scratch — per-token,
per-CHARACTER list_reduce folds over every document — and that signature
computation (not the band join) is the cost that kept d03 out of the x100
gate. Same cure as scripts/closure_gate.py: materialize the expensive shared
prefix ONCE to parquet, rewrite the oracle to read it, and hand the rewrite
to the standard scripts/check_oracle.py compare (symlinked dump), so the
hash semantics stay identical.

Usage: python3 scripts/simhash_gate.py <sfDir> <verifyOutDir> <workDir>
  <verifyOutDir> must hold a graft.Verify dump containing d03_simhash and an
  oracle_sql.json covering it.
"""
import sys, os, json, subprocess

sf_dir, out_dir, work = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(work, exist_ok=True)
sh_parquet = f"{work}/simhash.parquet"
D03 = "d03_simhash"
# the signature CTE's closing line — everything up to and including it is
# the per-character fold we memoize; everything after is the cheap band join
MARKER = "FROM bits GROUP BY doc_id),"

with open(f"{out_dir}/oracle_sql.json") as fh:
    oracles = json.load(fh)
sql = oracles[D03]
assert MARKER in sql, f"{D03} oracle no longer matches the memoization split"
prefix_end = sql.index(MARKER) + len(MARKER)
# the full signature computation as a standalone SELECT: the WITH chain up
# to `sh`, closed, reading out the sh CTE
sig_sql = sql[:prefix_end].rstrip().rstrip(",") + " SELECT doc_id, sh FROM sh"

import duckdb
con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '24GB')}'")
if "GRAFT_DUCKDB_THREADS" in os.environ:
    con.execute(f"SET threads={os.environ['GRAFT_DUCKDB_THREADS']}")
con.execute(f"SET temp_directory='{work}/.tmp'")
for f in os.listdir(sf_dir):
    if not f.endswith(".parquet"):
        continue
    name = f.removesuffix(".parquet")
    path = f"{sf_dir}/{f}"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

print(f"[simhash_gate] materializing signatures once -> {sh_parquet} ...",
      flush=True)
con.execute(f"COPY ({sig_sql}) TO '{sh_parquet}' (FORMAT PARQUET)")
n = con.execute(f"SELECT COUNT(*) FROM '{sh_parquet}'").fetchone()[0]
print(f"[simhash_gate] signatures done: {n} docs", flush=True)
con.close()

# rewrite: the band join reads the materialized signatures
rewritten = {D03: f"WITH sh AS (SELECT * FROM '{sh_parquet}')," + sql[prefix_end:]}
# recreate the dump symlink unconditionally: a stale link from a previous
# run with a DIFFERENT verifyOutDir would compare the rewritten oracle
# against the OLD run's dump — a wrong PASS, the worst failure mode
dst = f"{work}/{D03}"
if os.path.islink(dst):
    os.remove(dst)
elif os.path.exists(dst):
    raise SystemExit(f"refusing to replace non-symlink {dst}")
os.symlink(f"{os.path.abspath(out_dir)}/{D03}", dst)
with open(f"{work}/oracle_sql.json", "w") as fh:
    json.dump(rewritten, fh)
sys.exit(subprocess.call(
    [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py"),
     sf_dir, work]))
