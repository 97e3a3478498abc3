#!/usr/bin/env python3
"""Merge per-key oracle-gate logs into one committed result artifact.

Usage:
  merge_gate_results.py <keysFile> <out.json> <label1>:<log1> [<label2>:<log2> ...]

Each log holds scale_gate.sh / parallel_gate.py / trailing_gate.sh output
lines (PASS/FAIL/TIMEOUT/MISSING key (Ns)). Later logs OVERRIDE earlier ones
per key — pass the logs in chronological order, so a re-gate of a key that
previously failed on resources records the re-gate's verdict, while the
provenance field still names the run that produced the standing verdict.
Exits non-zero (and says so in the artifact) if any key in <keysFile> lacks
a PASS.
"""
import json, re, sys

keys_file, out_path = sys.argv[1], sys.argv[2]
keys = [k for k in open(keys_file).read().split()]
results = {}
for spec in sys.argv[3:]:
    label, log = spec.split(":", 1)
    for line in open(log):
        # lstrip: trailing_gate.sh indents its "  MISSING k" / "  DEADLINE k"
        # enumeration lines — an anchored match silently dropped them into
        # never_gated with no provenance
        m = re.match(r"(PASS|FAIL|TIMEOUT|MISSING|DEADLINE) (\S+)(?: \((\d+)s\))?",
                     line.lstrip())
        if not m:
            continue
        status, key, secs = m.group(1), m.group(2), m.group(3)
        if key not in keys:
            continue
        prev = results.get(key)
        # within one log a key can appear twice (requeue/retry) — last wins;
        # across logs, later logs override (they are chronological). BUT a
        # non-terminal verdict (MISSING/DEADLINE: "this run never saw the
        # dump" — e.g. a full keys file reused on a partial re-gate) must
        # not downgrade a standing terminal verdict, especially a PASS.
        if prev and status in ("MISSING", "DEADLINE") \
                and prev["status"] in ("PASS", "FAIL", "TIMEOUT"):
            # keep the terminal verdict, but don't let a stale PASS hide
            # that the LATEST run never reproduced the dump — flag it so an
            # engine regression that kills the dump step stays visible in
            # the artifact instead of riding an old run's green
            prev["later_" + status.lower() + "_in"] = label
            continue
        results[key] = {"status": status, "run": label,
                        **({"seconds": int(secs)} if secs else {})}

missing = [k for k in keys if k not in results]
not_pass = sorted(k for k, v in results.items() if v["status"] != "PASS")
artifact = {
    "n_keys": len(keys),
    "n_pass": sum(1 for v in results.values() if v["status"] == "PASS"),
    "not_pass": not_pass,
    "never_gated": missing,
    "keys": {k: results.get(k) for k in sorted(keys)},
}
with open(out_path, "w") as fh:
    json.dump(artifact, fh, indent=1)
print(f"{artifact['n_pass']} pass / {len(keys)} keys; "
      f"not_pass={not_pass} never_gated={missing}")
sys.exit(0 if artifact["n_pass"] == len(keys) else 1)
