#!/usr/bin/env python
"""Stacked quality A/B: ALL shipping defaults vs ALL reference semantics.

Every speed knob was promoted to default by its own 6-seed SWD study
(BASELINE.md: matmul precision 'default', fused fast augmentation, shear
warp, compute_dtype='mixed', gp_reuse_fakes), each judged by
tools/ab_aggregate.py with the promote criterion |mean paired diff| <
baseline seed spread.  That criterion can hide a per-knob regression of up
to ~1 seed sigma, and four such steps can compound — the full-stack vs
all-reference-semantics comparison was only ever run on 2 seeds, pre-shear
(VERDICT r2, "compounding-risk gap").  This study closes it:

  reference arm: precision='highest', compute_dtype='float32',
                 fast_augment=False, shear_warp=False, gp_reuse_fakes=False
                 (the reference's exact training semantics:
                 /root/reference/loss_functions.py:166 fresh GP draw,
                 /root/reference/data/NeuronDataset.py:113-126 transform
                 order, true-f32 matmuls)
  shipping arm:  every promoted default together

Run across >= 6 seeds via tools/run_multiseed_ab.sh and aggregate with
tools/ab_aggregate.py; if it rejects, bisect which knob's interaction fails
and demote it.

    python tools/stacked_ab.py [--epochs 2500] [--seed 1] [--out /tmp/stacked_ab]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from precision_ab import make_quality_ab_parser, run_quality_ab  # noqa: E402


def main():
    args = make_quality_ab_parser('/tmp/stacked_ab').parse_args()
    run_quality_ab(args,
                   arms=[('reference', {'precision_name': 'highest',
                                        'compute_dtype': 'float32',
                                        'fast_augment': False,
                                        'shear_warp': False,
                                        'gp_reuse_fakes': False,
                                        # the packed8 interior gates on
                                        # packed_lanes alone — pin the 2x2
                                        # layout so this arm is the exact
                                        # reference-semantics path
                                        'packed_lanes': None}),
                         ('shipping', {})],
                   verdict_ok='stack_ok', verdict_worse='stack_worse')


if __name__ == '__main__':
    main()
