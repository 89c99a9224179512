#!/usr/bin/env bash
# Priority-based test execution — the reference's inverted test pyramid
# (scripts/run_tests.sh:116-190, pytest.ini markers) ported to ScalaTest
# tags:
#   Priority 1: E2E        (@graft.tags.E2E suites + HealthSpec)
#   Priority 2: Integration (@graft.tags.Integration suites)
#   Priority 3: Unit        (everything untagged)
# E2E green => exit 0, lower tiers skipped (system validated). E2E red
# => lower tiers run to diagnose the root cause, exit 1. Infrastructure
# absence FAILS HealthSpec (never skips) — tests/test_health.py:1-48
# semantics. --force-all runs every tier regardless.
set -u
cd "$(dirname "$0")/.."

FORCE_ALL=""
[ "${1:-}" = "--force-all" ] && FORCE_ALL=1

run_tier() { # run_tier <label> <scalatest-args...>
  local label="$1"; shift
  echo "============================================"
  echo "[$label]"
  echo "============================================"
  sbt -batch "testOnly * -- $*"
}

e2e=0; integ=-1; unit=-1
run_tier "Priority 1: E2E tests" -n graft.tags.E2E || e2e=1

if [ $e2e -eq 0 ] && [ -z "$FORCE_ALL" ]; then
  echo "============================================"
  echo "SUCCESS: E2E tests passed."
  echo "Lower priority tests skipped (system validated)."
  echo "Tip: --force-all runs every tier regardless."
  echo "============================================"
  exit 0
fi
[ $e2e -ne 0 ] && echo "[FAIL] E2E tests failed - running lower tiers to diagnose root cause..."

integ=0
run_tier "Priority 2: Integration tests" -n graft.tags.Integration || integ=1
unit=0
run_tier "Priority 3: Unit tests" \
  -l graft.tags.E2E -l graft.tags.Integration || unit=1

echo "============================================"
echo "Test Execution Summary"
[ $e2e -eq 0 ]   && echo "E2E Tests:         PASSED" || echo "E2E Tests:         FAILED"
[ $integ -eq 0 ] && echo "Integration Tests: PASSED" || echo "Integration Tests: FAILED"
[ $unit -eq 0 ]  && echo "Unit Tests:        PASSED" || echo "Unit Tests:        FAILED"
echo "============================================"

final=$((e2e + integ + unit))
if [ $final -ne 0 ]; then
  echo "Root Cause Analysis:"
  [ $unit -ne 0 ]  && echo "  -> Unit tests failed: check operator logic and report algebra"
  [ $integ -ne 0 ] && echo "  -> Integration tests failed: check FTP/staging/stream components"
  [ $e2e -ne 0 ] && [ $integ -eq 0 ] && [ $unit -eq 0 ] && \
    echo "  -> Only E2E failed: check cross-component wiring (pipeline assembly, CLI, sinks)"
  exit 1
fi
exit 0
