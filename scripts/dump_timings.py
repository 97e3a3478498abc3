#!/usr/bin/env python3
"""Reconstruct per-key wall times from a sequential graft.Verify dump.

Verify runs keys one at a time, and each key's dump dir gets its _SUCCESS
at job commit — so within one Verify run, key wall time = its _SUCCESS
mtime minus the previous key's (the first key is measured from the run's
JVM start, passed as --t0 epoch seconds; session startup rides on it).

Usage:
  dump_timings.py <verifyOutDir> --run keys.txt:t0_epoch [--run more.txt:t0]

Multiple --run groups handle a dump that was restarted (e.g. after an OOM
kill): each group is its own mtime chain. Prints one JSON object
{key: seconds | "<=seconds"} on stdout, sorted by key. A "<=" value marks a
key whose chain predecessor is MISSING from the dump: the time Verify spent
on the missing key's failed attempt folds into this span, so the number is
an inflated upper bound on the key's own wall — tainted, not exact
(round-11 ADVICE).
"""
import json, os, sys

out_dir = sys.argv[1]
runs = []
args = sys.argv[2:]
for i in range(0, len(args), 2):
    assert args[i] == "--run", args[i]
    path, t0 = args[i + 1].rsplit(":", 1)
    runs.append((open(path).read().split(), float(t0)))

timings = {}
for keys, t0 in runs:
    done = []
    missing = set()
    for k in keys:
        s = os.path.join(out_dir, k, "_SUCCESS")
        if os.path.exists(s):
            done.append((os.path.getmtime(s), k))
        else:
            missing.add(k)
            print(f"WARN missing {k}", file=sys.stderr)
    # a missing key taints the next PRESENT key in file order (Verify dumps
    # in SparkEntry map order = keys-file order, so file order ≈ mtime order)
    tainted = set()
    present = {k for _, k in done}
    taint_next = False
    for k in keys:
        if k in missing:
            taint_next = True
        elif taint_next and k in present:
            tainted.add(k)
            taint_next = False
    prev = t0
    for mt, k in sorted(done):
        dt = round(mt - prev, 1)
        timings[k] = f"<={dt}" if k in tainted else dt
        prev = mt

print(json.dumps(dict(sorted(timings.items())), indent=1))
