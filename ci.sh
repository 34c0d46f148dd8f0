#!/usr/bin/env bash
# CI pipeline mirroring the reference's .gitlab-ci.yml stages
# (/root/reference/.gitlab-ci.yml: build -> test [example suites] -> bench).
# Stages:
#   test      - FAST smoke tier (~2 min): import-everything + one tiny e2e
#               per scheme + the new-feature tests.  Run this before EVERY
#               commit — it exists because round 2 shipped a NameError.
#   test-full - full unit suite on the 8-device CPU mesh (tests/conftest.py);
#               ~25+ min, run before a round snapshot / release.
#   drive  - example suites as integration tests (the reference runs
#            `example_context 1|2|3` = BFV/BGV/CKKS suites as its test stage)
#   bench  - headline benchmark on the accelerator (one JSON line)
# Usage: ./ci.sh [test|test-full|drive|bench|all]
set -euo pipefail
cd "$(dirname "$0")"

stage="${1:-all}"

run_test() {
  python -m pytest tests/test_smoke.py tests/test_security_general_mul.py -x -q
}

run_test_full() {
  # provision the persistent XLA:CPU cache (tests/conftest.py points at it;
  # cold-cache compiles dominated the 78-min r04 full-tier run) and spread
  # the compile load over both cores
  mkdir -p /tmp/jax_cache
  python -m pytest tests/ -q -n 2 --maxfail=1
}

run_drive() {
  python examples/bfv_basics.py --cpu
  python examples/bgv_basics.py --cpu
  python examples/ckks_basics.py --cpu --n 2048
  python examples/ckks_chebyshev.py --cpu
  python examples/serialization.py --cpu
  python examples/bootstrap_ckks.py --cpu --logn 6
}

run_bench() {
  python bench.py
}

case "$stage" in
  test)  run_test ;;
  test-full) run_test_full ;;
  drive) run_drive ;;
  bench) run_bench ;;
  all)   run_test; run_drive; run_bench ;;
  *) echo "usage: $0 [test|drive|bench|all]" >&2; exit 2 ;;
esac
