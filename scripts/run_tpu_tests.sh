#!/bin/sh
# Run the tpu-marked test suite on real hardware and record the evidence
# artifact the judge asked for (VERDICT r1 item 7).  Usage:
#   sh scripts/run_tpu_tests.sh [round-tag]
set -e
tag=${1:-manual}
cd "$(dirname "$0")/.."
MRI_TPU_TESTS=1 python -m pytest tests/ -q -m tpu 2>&1 | tee "TPU_TESTS_${tag}.log"
