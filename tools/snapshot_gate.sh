#!/usr/bin/env bash
# Snapshot gate: refuses the end-of-round snapshot commit if any source
# changed since the last recorded green `sbt test` / battery run.
#
# Why: rounds 6 and 8 both shipped a RED final snapshot the same way —
# a query added AFTER the last full test run tripped a suite guard the
# builder never re-ran. The rule ("never commit after the last test run
# if sources changed", NOTES.md) is 0-for-2 when enforced by memory;
# this script enforces it mechanically (VERDICT r8 task 6).
#
# Usage:
#   tools/snapshot_gate.sh record   # run IMMEDIATELY after a green full
#                                   # `sbt test` (+ battery, if run)
#   tools/snapshot_gate.sh check    # run IMMEDIATELY before the
#                                   # snapshot commit; exit 1 = REFUSE
#
# The fingerprint covers everything that can change test outcomes:
# tracked + untracked source/build files, NOT docs or artifacts.
set -euo pipefail
cd "$(dirname "$0")/.."
MARKER=.last_green_fingerprint

fingerprint() {
  # content hash of all build-relevant files, independent of mtimes;
  # includes uncommitted edits (tests run against the working tree)
  { git ls-files -co --exclude-standard -- 'src/**' build.sbt project/ 2>/dev/null \
      | sort | xargs -r sha256sum; } | sha256sum | cut -d' ' -f1
}

case "${1:-}" in
  record)
    fingerprint > "$MARKER"
    echo "gate: recorded green-run fingerprint $(cat "$MARKER")"
    ;;
  check)
    if [[ ! -f "$MARKER" ]]; then
      echo "gate: REFUSE — no recorded green run (run 'record' after sbt test)" >&2
      exit 1
    fi
    now="$(fingerprint)"
    was="$(cat "$MARKER")"
    if [[ "$now" != "$was" ]]; then
      echo "gate: REFUSE — sources changed since the last green test run." >&2
      echo "gate: re-run the FULL suite (and battery), then 'record' again." >&2
      exit 1
    fi
    echo "gate: OK — tree matches the last green run"
    ;;
  *)
    echo "usage: $0 {record|check}" >&2
    exit 2
    ;;
esac
