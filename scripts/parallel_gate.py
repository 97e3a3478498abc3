#!/usr/bin/env python3
"""Parallel trailing oracle gate: N workers pull keys from a shared queue,
waiting for each key's Spark dump (_SUCCESS) to land, then run one isolated
check_oracle.py process per key (own spill dir, bounded DuckDB memory and
threads, hard timeout with SIGKILL follow-up).

Usage:
  parallel_gate.py <sfDir> <verifyOutDir> <workDir> <keysFile> [--workers N]
                   [--skip k1,k2] [--timeout SEC] [--deadline EPOCH]

--deadline (or env GATE_DEADLINE_EPOCH) mirrors trailing_gate.sh's escape
hatch: the loose "any graft.Verify" liveness probe means an unrelated
co-resident Verify (different SF or out dir) would otherwise keep
never-to-land keys requeueing forever. Past the deadline, a key whose dump
has not landed is emitted as DEADLINE and dropped instead of requeued.

Why this exists: at the x1000 ScaleGen point a single serial gate is the
long pole (~minutes per DuckDB check); two bounded workers overlap the
checks with the still-running Spark dump without oversubscribing the box
(2 x 16 DuckDB threads + the dump JVM on 32 cores, 2 x 20 GB + the JVM's
64 GB inside 125 GB).
"""
import os, subprocess, sys, threading, time, queue

def main():
    args = sys.argv[1:]
    flags = {}
    pos = []
    i = 0
    while i < len(args):
        if args[i].startswith("--"):
            flags[args[i][2:]] = args[i + 1]
            i += 2
        else:
            pos.append(args[i])
            i += 1
    sf, out, work, keys_file = pos
    workers = int(flags.get("workers", "2"))
    timeout = int(flags.get("timeout", "600"))
    deadline = float(flags.get("deadline",
                               os.environ.get("GATE_DEADLINE_EPOCH", "0")))
    skip = set(flags.get("skip", "").split(",")) - {""}
    scripts = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(work, exist_ok=True)

    keys = [k for k in open(keys_file).read().split() if k not in skip]
    q = queue.Queue()
    for k in keys:
        q.put(k)
    results, lock = [], threading.Lock()

    def emit(line):
        with lock:
            results.append(line)
            print(line, flush=True)

    def worker(wid):
        env = dict(os.environ,
                   GRAFT_DUCKDB_MEM=os.environ.get("GRAFT_DUCKDB_MEM", "20GB"),
                   GRAFT_DUCKDB_THREADS=os.environ.get("GRAFT_DUCKDB_THREADS", "16"))
        wdir = os.path.join(work, f"w{wid}")
        os.makedirs(wdir, exist_ok=True)
        misses = 0
        while True:
            try:
                k = q.get_nowait()
            except queue.Empty:
                return
            # dump not landed yet (the Verify process may still be running):
            # REQUEUE and move on — dump order is SparkEntry map order, not
            # key order, so blocking on this key would idle the worker while
            # already-dumped keys wait. Sleep only after a full fruitless
            # cycle (misses ~ queue size) to avoid busy-spinning the tail.
            if not os.path.exists(os.path.join(out, k, "_SUCCESS")):
                # Liveness probe matches ANY graft.Verify, not "graft.Verify
                # <sf>": the sf spelling in the launcher's argv (relative,
                # symlinked, trailing slash) need not equal ours, and a false
                # "gone" verdict silently drops keys. Worst case of the loose
                # match is extra polling while an unrelated Verify runs.
                verify_alive = subprocess.run(
                    ["pgrep", "-f", "graft.Verify"],
                    capture_output=True).returncode == 0
                # TOCTOU: Verify may have committed this key and exited
                # between the _SUCCESS check and pgrep — re-check before
                # declaring it missing, and requeue so the normal path
                # processes the just-landed dump.
                if os.path.exists(os.path.join(out, k, "_SUCCESS")):
                    q.put(k)
                elif not verify_alive:
                    emit(f"MISSING {k} (verify gone, never dumped)")
                elif deadline and time.time() > deadline:
                    emit(f"DEADLINE {k} (never dumped by GATE_DEADLINE_EPOCH)")
                else:
                    q.put(k)
                    misses += 1
                    if misses >= q.qsize():
                        time.sleep(15)
                        misses = 0
            else:
                misses = 0
                t0 = time.time()
                logf = os.path.join(work, f"{k}.log")
                with open(logf, "w") as lf:
                    p = subprocess.Popen(
                        ["python3", os.path.join(scripts, "check_oracle.py"), sf, out, k],
                        stdout=lf, stderr=subprocess.STDOUT, cwd=wdir, env=env)
                    try:
                        rc = p.wait(timeout=timeout)
                        dt = int(time.time() - t0)
                        emit(f"{'PASS' if rc == 0 else 'FAIL'} {k} ({dt}s)"
                             + ("" if rc == 0 else f" rc={rc} log={logf}"))
                    except subprocess.TimeoutExpired:
                        p.kill()
                        p.wait()
                        emit(f"TIMEOUT {k} ({timeout}s)")
                subprocess.run(["rm", "-rf", os.path.join(wdir, ".tmp")])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    npass = sum(1 for r in results if r.startswith("PASS"))
    print(f"parallel_gate: {npass} pass, {len(results) - npass} not-pass "
          f"of {len(keys)} keys", flush=True)
    sys.exit(0 if npass == len(keys) else 1)

if __name__ == "__main__":
    main()
