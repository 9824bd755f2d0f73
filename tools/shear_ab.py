#!/usr/bin/env python
"""Quality A/B: point-gather affine warp (the shipping fast_augment path)
vs the 3-pass integer-shift SHEAR warp (config.shear_warp) on a full
16->128 progressive growth run, judged by multi-scale sliced Wasserstein
distance against the real set.

Why: the warp gather is the single largest op in the 512^2 step (16.6
ms/step of 101; BASELINE.md op trace) and is already at its exact-semantics
hardware optimum; the shear warp is the same rotation+translation+flip
family with per-shear-pass rounding instead of per-point rounding —
measured 11.26 vs 9.87 steps/s (+14%) at 512^2.  This experiment supplies
the quality evidence for whether that distribution change is free.

    python tools/shear_ab.py [--epochs 2500] [--seed 1] [--out /tmp/shear_ab]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from precision_ab import make_quality_ab_parser, run_quality_ab  # noqa: E402


def main():
    args = make_quality_ab_parser('/tmp/shear_ab').parse_args()
    run_quality_ab(args,
                   arms=[('gather', {'shear_warp': False}),
                         ('shear', {'shear_warp': True})],
                   verdict_ok='shear_ok', verdict_worse='shear_worse')


if __name__ == '__main__':
    main()
