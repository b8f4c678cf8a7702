#!/usr/bin/env bash
# Round-8 failure-class regression (VERDICT r8 item 8): the five queries that
# shipped red under the driver's pandas comparator must stay green under the
# driver-identical local mirror, and the mirror's own negative controls
# (HUGEINT -> float64 leak, array-valued output) must keep FAILING.
#
# Fast: sf0.001, five queries. Run from the repo root.
set -euo pipefail
SF=${1:-/root/testdata/sf0.001}
OUT=$(mktemp -d /tmp/regress_d9.XXXX)
trap 'rm -rf "$OUT"' EXIT

python3 tools/verify_oracle.py --selftest

QS="w9_interval_range s10_cum_users s11_gap_stats x36_cms_words u6_centroid_agg"
sbt -batch "runMain graft.Verify $SF $OUT $QS" >/dev/null 2>&1
python3 tools/verify_oracle.py "$SF" "$OUT" $QS
echo "regress_d9: all five round-8 reds green under the driver-shaped comparator"
