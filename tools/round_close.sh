#!/bin/bash
# Round-close routine (VERDICT r11 #2 — the recurring artifact-hygiene item):
#   1. regenerate the sf0.1 oracle artifact (VERIFY_sf01.json) over the FULL
#      catalog, so the committed two-SF record never lags the query set;
#   2. run the full bench at sf0.1 into bench.json (the self-checking
#      protocol writes warm-ups, sweep membership, canary readings and any
#      self-heal evidence into the artifact);
#   3. stage every artifact so the round's closing commit carries them.
# (No sf0.01 twin here — the driver's own CORRECTNESS_rN gate IS the sf0.01
# record; this script keeps the builder-side half of the two-SF discipline.)
#
# Run from the repo root with nothing else on the box (measurement
# discipline: Verify/Bench must not overlap other load). ~25 min total.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

echo "[round_close] 1/2 Verify @ sf0.1 -> VERIFY_sf01.json"
rm -rf /tmp/rc_sf01
tools/run_main.sh graft.Verify /root/testdata/sf0.1 /tmp/rc_sf01 >/tmp/rc_sf01.log 2>&1
python3 tools/check.py /root/testdata/sf0.1 /tmp/rc_sf01 VERIFY_sf01.json | tail -1
# a hash-match on 0 rows is consistency, not coverage (the q218 lesson)
python3 -c "import json; e=json.load(open('/tmp/rc_sf01/empty.json')); print('[round_close] zero-row queries:', ', '.join(e) if e else 'none')"

echo "[round_close] 2/2 Bench @ sf0.1 -> bench.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run_main.sh graft.Bench \
  2>/tmp/rc_bench.err | tail -1

git add VERIFY_sf01.json bench.json 2>/dev/null || true
# track any driver records dropped since the last round
git add BENCH_r*.json CORRECTNESS_r*.json 2>/dev/null || true
echo "[round_close] staged: $(git diff --cached --name-only | tr '\n' ' ')"
echo "[round_close] done — review and commit."
