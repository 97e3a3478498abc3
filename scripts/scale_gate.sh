#!/usr/bin/env bash
# Per-key scale oracle gate (SURVEY §6). Run AFTER a full graft.Verify dump
# at a ScaleGen point:
#
#   scripts/scale_gate.sh <sfDir> <verifyOutDir> <workDir> [key ...]
#
# One check_oracle.py process per key, each under a 10-minute timeout, with
# the DuckDB spill dir (<workDir>/.tmp — in-memory DuckDB spills to .tmp
# under its cwd) cleared between keys. The round-10 lesson: a monolithic
# check_oracle run lets ONE oracle's spill fill the disk and take every
# later key down with it; per-process isolation contains both the timeout
# and the disk.
#
# With no explicit keys, gates every key in <verifyOutDir>/oracle_sql.json.
# Exits non-zero if any key fails or times out; per-key logs in <workDir>.
set -u
SF="$1"; OUT="$2"; WORK="$3"; shift 3
SCRIPTS="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$WORK"
# Per-key timeout: 600s covers the sf0.01..x100 points; the x1000 heavy
# keys (d28's cell-pair replay, q44's interleave) need more — override via
# GATE_TIMEOUT without editing the loop.
TIMEOUT="${GATE_TIMEOUT:-600}"

if [ $# -gt 0 ]; then
  KEYS=("$@")
else
  mapfile -t KEYS < <(python3 -c "import json; print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
fi

pass=0; fail=0
for k in "${KEYS[@]}"; do
  t0=$(date +%s)
  # -k: DuckDB can sit in native code past SIGTERM — follow with SIGKILL
  # (measured: a timed-out d28 x1000 check kept 22 GB / 2 cores for 10+ min)
  if (cd "$WORK" && timeout -k 15 "$TIMEOUT" python3 "$SCRIPTS/check_oracle.py" "$SF" "$OUT" "$k" > "$WORK/$k.log" 2>&1); then
    echo "PASS $k ($(( $(date +%s) - t0 ))s)"
    pass=$((pass+1))
  else
    rc=$?
    if [ "$rc" -eq 124 ]; then
      echo "TIMEOUT $k (${TIMEOUT}s)"
    else
      echo "FAIL $k (rc=$rc, $(( $(date +%s) - t0 ))s, log: $WORK/$k.log)"
    fi
    fail=$((fail+1))
  fi
  rm -rf "$WORK/.tmp"
done
echo "scale_gate: $pass pass, $fail fail/timeout of ${#KEYS[@]} keys"
[ "$fail" -eq 0 ]
