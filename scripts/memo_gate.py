#!/usr/bin/env python3
"""Generalized memoized oracle gate for heavy keys at scale points.

The q47/d03 lesson, made reusable: a scale-point oracle that dies on
resources usually dies in ONE expensive shared stage (a per-character fold,
an |corpus|x|centroids| float scan, a pair-view self-join) whose OUTPUT is
small. Materialize that stage's CTE to parquet in its own statement (full
memory budget, streaming COPY, no concurrent compare), rewrite the oracle to
read the parquet, and hand the rewrite to the standard check_oracle.py
compare — the hash semantics are untouched because every per-row computation
(including contractually-ordered list_reduce folds) happens in exactly one
place either way; only statement boundaries move. This is the "decompose
ACROSS pairs/stages, never inside a fold" adjudication from SURVEY §7i.

Usage:
  memo_gate.py <sfDir> <verifyOutDir> <workDir> <key> <cte>=<cols> [...]
               [--reuse]

Each <cte>=<cols> names a CTE of the key's oracle (from
<verifyOutDir>/oracle_sql.json) to materialize, with the projection to keep.
Memo statements run IN ORDER and each reads all earlier memos from parquet
(so a chain like asg0 -> dup costs each stage once). The final rewritten
oracle replaces everything up to the LAST memoized CTE with parquet reads
for ALL memoized CTEs — every CTE the suffix references must therefore be
memoized or defined in the suffix itself (the script checks this).
--reuse skips re-COPY for memo parquets that already exist (crash recovery
for multi-hour stages; only safe while the oracle SQL and sfDir are
unchanged — the tool stores the memo statement next to the parquet and
refuses to reuse on mismatch).
"""
import json, os, re, subprocess, sys

def parse_ctes(sql):
    """Return (ctes, body_start) where ctes = [(name, start, end)] covering
    'name AS ( ... )' spans in the top-level WITH chain; end = index just
    past the closing paren."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.I)
    assert m, "oracle does not start with WITH"
    i = m.end()
    ctes = []
    while True:
        nm = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*(NOT\s+MATERIALIZED\s*|MATERIALIZED\s*)?\(", re.I)
        mm = nm.match(sql, i)
        assert mm, f"expected CTE at offset {i}: {sql[i:i+60]!r}"
        name = mm.group(1)
        depth, j = 1, mm.end()
        while depth:
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "'":  # string literal: skip to close (doubled '' ok)
                j += 1
                while not (sql[j] == "'" and sql[j + 1 : j + 2] != "'"):
                    j += 2 if sql[j] == "'" else 1
            j += 1
        ctes.append((name, i, j))
        i = j
        mm = re.match(r"\s*,", sql[i:])
        if not mm:
            return ctes, i
        i += mm.end()

def main():
    args = [a for a in sys.argv[1:] if a != "--reuse"]
    reuse = "--reuse" in sys.argv
    sf_dir, out_dir, work, key = args[:4]
    memos = [a.split("=", 1) for a in args[4:]]
    assert memos, "at least one <cte>=<cols> memo spec required"
    os.makedirs(work, exist_ok=True)

    with open(f"{out_dir}/oracle_sql.json") as fh:
        sql = json.load(fh)[key]
    # a WITH RECURSIVE oracle (e.g. the reachability closures) keeps the
    # keyword in every rewritten statement — DuckDB accepts RECURSIVE with
    # non-recursive CTE lists, so using it uniformly is safe, while dropping
    # it breaks any suffix that still contains the recursive CTE
    with_kw = "WITH RECURSIVE " if re.match(r"\s*WITH\s+RECURSIVE", sql, re.I) \
        else "WITH "
    ctes, _ = parse_ctes(sql)
    spans = {n: (s, e) for n, s, e in ctes}
    order = [n for n, _, _ in ctes]
    for n, _ in memos:
        assert n in spans, f"CTE {n} not in {key} oracle (has {order})"
    memo_names = [n for n, _ in memos]
    # memos must be given in oracle order (each reads earlier ones)
    assert [n for n in order if n in memo_names] == memo_names, \
        "memo specs must be in the oracle's CTE order"
    last = memo_names[-1]
    last_end = spans[last][1]

    # the suffix may only reference memoized CTEs or CTEs it defines itself
    suffix = sql[last_end:].lstrip().lstrip(",").lstrip()
    for n, s, e in ctes:
        if e <= last_end and n not in memo_names:
            assert not re.search(rf"\b{n}\b", suffix), \
                f"suffix references un-memoized CTE {n} — memoize it too"

    import duckdb
    con = duckdb.connect()
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

    def memo_reads(upto):
        return [f"{n} AS (SELECT * FROM '{work}/{key}__{n}.parquet')"
                for n in memo_names[:upto]]

    for idx, (n, cols) in enumerate(memos):
        pq = f"{work}/{key}__{n}.parquet"
        stmt_ctes = memo_reads(idx) + [
            sql[s:e] for (nm, s, e) in ctes
            if e <= spans[n][1] and nm not in memo_names[:idx]]
        stmt = with_kw + ",\n".join(stmt_ctes) + f" SELECT {cols} FROM {n}"
        sig_path = pq + ".sql"
        if reuse and os.path.exists(pq) and os.path.exists(sig_path) \
                and open(sig_path).read() == stmt:
            print(f"[memo_gate] reusing {pq}", flush=True)
            continue
        print(f"[memo_gate] materializing {n} -> {pq} ...", flush=True)
        import time
        t0 = time.time()
        con.execute(f"COPY ({stmt}) TO '{pq}' (FORMAT PARQUET)")
        nr = con.execute(f"SELECT COUNT(*) FROM '{pq}'").fetchone()[0]
        with open(sig_path, "w") as fh:
            fh.write(stmt)
        print(f"[memo_gate] {n}: {nr} rows in {int(time.time() - t0)}s", flush=True)
    con.close()

    rewritten = with_kw + ",\n".join(memo_reads(len(memos)))
    if suffix.upper().startswith("SELECT"):
        rewritten += " " + suffix
    else:
        rewritten += ",\n" + suffix
    dst = f"{work}/{key}"
    if os.path.islink(dst):
        os.remove(dst)
    elif os.path.exists(dst):
        raise SystemExit(f"refusing to replace non-symlink {dst}")
    os.symlink(f"{os.path.abspath(out_dir)}/{key}", dst)
    with open(f"{work}/oracle_sql.json", "w") as fh:
        json.dump({key: rewritten}, fh)
    sys.exit(subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py"),
         sf_dir, work]))

if __name__ == "__main__":
    main()
