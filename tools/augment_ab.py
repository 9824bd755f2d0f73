#!/usr/bin/env python
"""Quality A/B: exact reference-order augmentation (warp at full padded
resolution, then resize — reference data/NeuronDataset.py:113-126) vs the
fast_augment path (resize first, jitter + crop-fused warp at phase scale)
on a full 16->128 progressive growth run, judged by multi-scale sliced
Wasserstein distance against the real set.

The per-phase bench table (BASELINE.md) shows the full-resolution warp
gather pins every phase below 256^2 at ~20-25 steps/s; this experiment
supplied the quality evidence for making fast_augment the default (run
twice: once for the original phase-scale order, once after the crop/jitter
fusion — both recorded in BASELINE.md; fast was never worse).

    python tools/augment_ab.py [--epochs 2500] [--seed 1] [--out /tmp/augment_ab]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from precision_ab import make_quality_ab_parser, run_quality_ab  # noqa: E402


def main():
    args = make_quality_ab_parser('/tmp/augment_ab').parse_args()
    # pin shear off in BOTH arms so this A/B isolates the ordering knob:
    # shear is inert when fast_augment=False, so leaving the shared
    # shear_warp=True default would make the 'fast' arm vary two knobs at
    # once (tools/shear_ab.py covers the shear knob on its own)
    run_quality_ab(args,
                   arms=[('exact', {'fast_augment': False,
                                    'shear_warp': False}),
                         ('fast', {'fast_augment': True,
                                   'shear_warp': False})],
                   verdict_ok='fast_ok', verdict_worse='fast_worse')


if __name__ == '__main__':
    main()
