#!/bin/bash
# Resumable per-file test sweep (CLAUDE.md: long single-process runs get
# SIGTERM'd ~60min; one pytest invocation per file, skip already-logged).
LOG=${1:-/tmp/sweep_r5.log}
cd /root/repo
for f in tests/test_*.py; do
  if grep -q "^DONE $f" "$LOG" 2>/dev/null; then continue; fi
  echo "RUN $f $(date +%T)" >> "$LOG"
  timeout 1200 python -m pytest "$f" -q --no-header 2>&1 | tail -3 >> "$LOG"
  rc=$?
  echo "DONE $f rc=$rc" >> "$LOG"
done
echo "SWEEP COMPLETE" >> "$LOG"
