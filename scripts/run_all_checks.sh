#!/usr/bin/env bash
# One-shot validation: everything the round is graded on, in order.
set -e
cd "$(dirname "$0")/.."

echo '== 1. test suite (parity + spark e2e + fuzz) =='
python3 -m pytest tests/ -q

echo '== 2. driver contract vs DuckDB oracles (sf0.01) =='
python3 scripts/check_contract.py /root/testdata/sf0.01

echo '== 3. physical plan properties =='
python3 scripts/explain_plans.py

echo '== 4. bench (one JSON line) =='
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" python3 bench.py

echo '== 5. scaling evidence (writes BENCH/BASELINE.md; ~15 min) =='
python3 scripts/scaling_bench.py
