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
{key: seconds} on stdout, sorted by key.
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
    for k in keys:
        s = os.path.join(out_dir, k, "_SUCCESS")
        if os.path.exists(s):
            done.append((os.path.getmtime(s), k))
        else:
            print(f"WARN missing {k}", file=sys.stderr)
    prev = t0
    for mt, k in sorted(done):
        timings[k] = round(mt - prev, 1)
        prev = mt

print(json.dumps(dict(sorted(timings.items())), indent=1))
