#!/usr/bin/env bash
# Full local verification: the driver-gate twin at every scale factor,
# the whole test suite, and the bench line.
set -euo pipefail
cd "$(dirname "$0")"

echo "== parity @ sf0.001 =="
PARITY_SF_DIR=/root/testdata/sf0.001 python3 -m pytest tests/test_oracle_parity.py -q
echo "== parity @ sf0.01 (the driver gate) =="
PARITY_SF_DIR=/root/testdata/sf0.01 python3 -m pytest tests/test_oracle_parity.py -q
echo "== parity @ sf0.1 =="
PARITY_SF_DIR=/root/testdata/sf0.1 python3 -m pytest tests/test_oracle_parity.py -q
echo "== full suite =="
python3 -m pytest tests/ -q
echo "== bench =="
python3 bench.py
