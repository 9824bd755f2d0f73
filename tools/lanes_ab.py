#!/usr/bin/env python
"""Stacked quality A/B for the full-lane 2x4 layout promotion.

The packed_lanes=128 routing is an exact layout transform plus tap-sum
reorder (the same deviation class as the promoted fused boundary kernels),
but per the standing rule from the round-3 verdict any further promotion
re-runs the STACKED arms rather than a knob-only A/B: the shipping stack's
quality margin over reference semantics is thin enough (2/6 seeds worse
beyond spread in the r3 study) that each new default must re-prove the
whole combination.

  reference arm: precision='highest', compute_dtype='float32',
                 fast_augment=False, shear_warp=False, gp_reuse_fakes=False
                 (the reference's exact training semantics — identical to
                 tools/stacked_ab.py's reference arm)
  candidate arm: every promoted default together PLUS packed_lanes=128

Run across >= 6 seeds via tools/run_multiseed_ab.sh and aggregate with
tools/ab_aggregate.py.

    python tools/lanes_ab.py [--epochs 2500] [--seed 1] [--out /tmp/lanes_ab]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from precision_ab import make_quality_ab_parser, run_quality_ab  # noqa: E402


def main():
    args = make_quality_ab_parser('/tmp/lanes_ab').parse_args()
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
                         ('shipping_lanes', {'packed_lanes': 128})],
                   verdict_ok='stack_ok', verdict_worse='stack_worse')


if __name__ == '__main__':
    main()
