#!/usr/bin/env bash
# Trailing per-key oracle gate: polls a (still-running) graft.Verify dump
# dir and gates each key as its _SUCCESS marker lands, so the DuckDB side
# pipelines behind the Spark side instead of serializing after it.
#
#   scripts/trailing_gate.sh <sfDir> <verifyOutDir> <workDir> <keysFile>
#
# Same per-key isolation as scale_gate.sh (one check_oracle process, 10-min
# timeout, spill dir cleared). Requires <verifyOutDir>/oracle_sql.json to
# exist up front (pre-seed it from a full sf0.01 dump — the SQL is the same
# build's SparkEntry.oracleSql either way). Stops when every key in
# <keysFile> is gated or when GATE_DEADLINE_EPOCH passes.
set -u
SF="$1"; OUT="$2"; WORK="$3"; KEYS_FILE="$4"
SCRIPTS="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$WORK"
# This gate shares the box with the live Verify JVM — bound DuckDB unless
# the caller already chose a budget (see check_oracle.py, which now only
# caps threads when asked).
export GRAFT_DUCKDB_THREADS="${GRAFT_DUCKDB_THREADS:-16}"
mapfile -t KEYS < "$KEYS_FILE"
declare -A done
pass=0; fail=0; remaining=${#KEYS[@]}
while [ "$remaining" -gt 0 ]; do
  progressed=0
  for k in "${KEYS[@]}"; do
    [ -n "${done[$k]:-}" ] && continue
    [ -f "$OUT/$k/_SUCCESS" ] || continue
    t0=$(date +%s)
    if (cd "$WORK" && timeout -k 15 600 python3 "$SCRIPTS/check_oracle.py" "$SF" "$OUT" "$k" > "$WORK/$k.log" 2>&1); then
      echo "PASS $k ($(( $(date +%s) - t0 ))s)"
      pass=$((pass+1))
    else
      rc=$?
      if [ "$rc" -eq 124 ]; then echo "TIMEOUT $k (600s)"; else echo "FAIL $k (rc=$rc, $(( $(date +%s) - t0 ))s)"; fi
      fail=$((fail+1))
    fi
    done[$k]=1; remaining=$((remaining-1)); progressed=1
    rm -rf "$WORK/.tmp"
  done
  if [ "$remaining" -gt 0 ] && [ "$progressed" -eq 0 ]; then
    # deadline: a hung Verify JVM must not pin the gate forever
    if [ -n "${GATE_DEADLINE_EPOCH:-}" ] && [ "$(date +%s)" -gt "$GATE_DEADLINE_EPOCH" ]; then
      echo "trailing_gate: GATE_DEADLINE_EPOCH passed with $remaining keys ungated:"
      for k in "${KEYS[@]}"; do [ -z "${done[$k]:-}" ] && echo "  DEADLINE $k"; done
      break
    fi
    # nothing new: if the Verify JVM is gone and nothing is pending, stop.
    # Match ANY graft.Verify, not "graft.Verify $SF" — argv path spelling
    # (relative vs absolute) need not equal ours, and a false "gone" verdict
    # drops every pending key (round-11 ADVICE).
    if ! pgrep -f "graft.Verify" > /dev/null; then
      # TOCTOU: Verify may have committed its last key and exited since the
      # top-of-loop _SUCCESS scan — one more pass picks those up next cycle.
      landed=0
      for k in "${KEYS[@]}"; do
        [ -z "${done[$k]:-}" ] && [ -f "$OUT/$k/_SUCCESS" ] && landed=1
      done
      if [ "$landed" -eq 0 ]; then
        echo "trailing_gate: verify process gone with $remaining keys never dumped:"
        for k in "${KEYS[@]}"; do [ -z "${done[$k]:-}" ] && echo "  MISSING $k"; done
        break
      fi
    else
      sleep 20
    fi
  fi
done
echo "trailing_gate: $pass pass, $fail fail/timeout of ${#KEYS[@]} keys"
[ "$fail" -eq 0 ] && [ "$remaining" -eq 0 ]
