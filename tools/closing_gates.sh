#!/usr/bin/env bash
# Round closing gates — run over the FINAL tree, in order, each in its
# own process (fresh-session isolation; the sf0.1 and sf1 bench tiers
# must never share a JVM with the pytest/parity runs):
#
#   1. full pytest                      (correctness, unit + e2e)
#   2. full-registry parity at sf0.01   (the driver's oracle gate)
#   3. bench.py                         (sf0.1 frozen 2x gates + the
#                                        fresh-session streaming tier)
#   4. bench.py --sf 1                  (standing sf1 gated tier,
#                                        VERDICT r11 #6)
#
# Every step must exit 0. Record the tally in STATUS.md. Refreeze
# baselines ONLY from a green full-suite run and only when the
# measurement action changed.
set -uo pipefail
cd "$(dirname "$0")/.."
rc=0

echo "== 1/4 pytest =="
python -m pytest tests/ -q || rc=1

echo "== 2/4 full parity (sf0.01) =="
python tools/parity_check.py /root/testdata/sf0.01 | tail -3 || rc=1

echo "== 3/4 bench sf0.1 =="
python bench.py > /dev/null || rc=1

echo "== 4/4 bench sf1 =="
python bench.py --sf 1 > /dev/null || rc=1

echo "closing gates rc=$rc"
exit $rc
