#!/usr/bin/env python
"""Quality A/B: compute_dtype='float32' (shipping default) vs 'mixed'
(bfloat16 activations through the conv blocks, float32 stem / PixelNorm
statistics / to_rgb image / critic head) on a full 16->128 progressive
growth run, judged by multi-scale sliced Wasserstein distance against the
real set.

Round 1 established that pure-bfloat16 training collapses; 'mixed' is the
quality-safe recipe candidate (+25% step throughput at 512^2 over the
f32-activation default — BASELINE.md).  Result (recorded there): worse in
both seeds -> stays opt-in.

    python tools/mixed_ab.py [--epochs 2500] [--seed 1] [--out /tmp/mixed_ab]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from precision_ab import make_quality_ab_parser, run_quality_ab  # noqa: E402


def main():
    args = make_quality_ab_parser('/tmp/mixed_ab').parse_args()
    run_quality_ab(args,
                   arms=[('f32', {'compute_dtype': 'float32'}),
                         ('mixed', {'compute_dtype': 'mixed'})],
                   verdict_ok='mixed_ok', verdict_worse='mixed_worse')


if __name__ == '__main__':
    main()
