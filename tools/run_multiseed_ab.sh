#!/bin/bash
# Run a two-arm quality A/B across many seeds and aggregate the verdict.
#
#   tools/run_multiseed_ab.sh gp_reuse_ab  fresh gather-log.jsonl 1 2 3 4 5 6
#   tools/run_multiseed_ab.sh <tool-stem> <base-arm-tag> <log-file> <seeds...>
#
# Each seed runs both arms (2500-epoch 16->128 growth; one synthetic dataset
# per seed) under the current shipping defaults, appending the per-arm JSON
# lines to <log-file>; the final verdict comes from tools/ab_aggregate.py,
# which calibrates the paired differences against the baseline arm's own
# across-seed spread (see that tool's docstring for the promotion rule).
set -euo pipefail
cd "$(dirname "$0")/.."

tool="$1"; base="$2"; log="$3"; shift 3
for seed in "$@"; do
    echo "=== $tool seed $seed ===" >&2
    # a failed seed (e.g. a TPU-tunnel outage mid-run) must not abort the
    # study: ab_aggregate drops incomplete seeds instead of mis-pairing
    if ! python "tools/${tool}.py" --seed "$seed" \
        --out "/tmp/${tool}_s${seed}" | tee -a "$log"; then
        echo "=== seed $seed FAILED — continuing ===" >&2
    fi
done

# arm tags: base is given; candidate is whichever other tag appears
cand=$(grep -oP '(?<="arm": ")[^"]+' "$log" | sort -u | grep -v "^${base}$" | head -1)
python tools/ab_aggregate.py "$log" --base "$base" --cand "$cand"
