#!/usr/bin/env python3
"""Shared-closure oracle gate for the cluster-artifact consumers.

The d10/d22/d26/d29/d32 oracles all embed the same WITH RECURSIVE
connected-components closure over the simhash candidate graph. At 10x+
scale that closure alone costs ~105 min of DuckDB CPU — running it once
per key (5x) is pure waste. This script:

  1. materializes the closure (doc_id, cluster_id) ONCE to parquet,
  2. rewrites each closure oracle to read the materialized table,
  3. hands the rewritten oracles to the standard scripts/check_oracle.py
     compare (symlinked dumps), so the hash semantics stay identical.

Usage: python3 scripts/closure_gate.py <sfDir> <verifyOutDir> <workDir>
  <verifyOutDir> must hold a FULL graft.Verify dump (dirs + oracle_sql.json).
"""
import sys, os, json, subprocess

sf_dir, out_dir, work = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(work, exist_ok=True)
cl_parquet = f"{work}/closure.parquet"

with open(f"{out_dir}/oracle_sql.json") as fh:
    oracles = json.load(fh)

MARKER = "cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)"
closure_keys = [k for k, v in oracles.items() if MARKER in v]
# d10 IS the closure readout (same CTE chain, closure as final SELECT)
d10 = "d10_neardup_clusters"

import duckdb
con = duckdb.connect()
# Same bounds as check_oracle.py: the closure materialization is the single
# heaviest DuckDB statement in the repo (recursive CTE over the candidate
# graph — ~105 min at the x10 point) and an unbounded connection races
# co-resident JVMs into the kernel OOM killer at x100.
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '24GB')}'")
if "GRAFT_DUCKDB_THREADS" in os.environ:
    con.execute(f"SET threads={os.environ['GRAFT_DUCKDB_THREADS']}")
con.execute(f"SET temp_directory='{work}/.tmp'")
con.execute(
    f"SET max_temp_directory_size='{os.environ.get('GRAFT_DUCKDB_TMPMAX', '64GB')}'")
for f in os.listdir(sf_dir):
    if not f.endswith(".parquet"):
        continue
    name = f.removesuffix(".parquet")
    path = f"{sf_dir}/{f}"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

# 1. materialize the closure once (d10's oracle minus its ORDER BY is
#    exactly the closure table)
closure_sql = oracles[d10].rsplit("ORDER BY", 1)[0]
print(f"[closure_gate] materializing closure once for {len(closure_keys)+1} "
      f"keys ({d10} + {', '.join(sorted(closure_keys))}) ...", flush=True)
con.execute(f"COPY ({closure_sql}) TO '{cl_parquet}' (FORMAT PARQUET)")
n = con.execute(f"SELECT COUNT(*) FROM '{cl_parquet}'").fetchone()[0]
print(f"[closure_gate] closure done: {n} rows -> {cl_parquet}", flush=True)

# 2. rewrite: closure consumers read the materialized table; d10 compares
#    the table itself (ordered)
rewritten = {d10: f"SELECT doc_id, cluster_id FROM '{cl_parquet}' ORDER BY doc_id"}
for k in closure_keys:
    tail = oracles[k].split(MARKER, 1)[1]
    rewritten[k] = f"WITH cl AS (SELECT * FROM '{cl_parquet}')" + tail

# 3. standard compare over symlinked dumps
for k in rewritten:
    dst = f"{work}/{k}"
    if not os.path.islink(dst) and not os.path.exists(dst):
        os.symlink(f"{os.path.abspath(out_dir)}/{k}", dst)
with open(f"{work}/oracle_sql.json", "w") as fh:
    json.dump(rewritten, fh)
sys.exit(subprocess.call(
    [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py"),
     sf_dir, work]))
