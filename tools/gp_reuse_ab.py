#!/usr/bin/env python
"""Quality A/B: fresh gradient-penalty fakes (the reference draws new
latents inside D_grad_pen_loss — loss_functions.py:166) vs reusing the
critic-loss fake batch for the GP interpolates (the original WGAN-GP
formulation, Gulrajani et al. 2017, which penalizes the same fake
minibatch).

Reuse lets XLA CSE the duplicated generator forward out of the critic step
(+13% at 512^2 — BASELINE.md).  Result (recorded there): the initial
2-seed run split; the 6-seed rerun promoted it to the shipping default
(mean paired diff inside the fresh arm's own seed spread).

    python tools/gp_reuse_ab.py [--epochs 2500] [--seed 1] [--out /tmp/gp_reuse_ab]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from precision_ab import make_quality_ab_parser, run_quality_ab  # noqa: E402


def main():
    args = make_quality_ab_parser('/tmp/gp_reuse_ab').parse_args()
    run_quality_ab(args,
                   arms=[('fresh', {'gp_reuse_fakes': False}),
                         ('reuse', {'gp_reuse_fakes': True})],
                   verdict_ok='reuse_ok', verdict_worse='reuse_worse')


if __name__ == '__main__':
    main()
