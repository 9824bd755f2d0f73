#!/usr/bin/env python
"""Quality A/B: the quality-default configuration vs the config_fast preset
(compute_dtype='mixed' + gp_reuse_fakes together) on a full 16->128
progressive growth run, judged by multi-scale sliced Wasserstein distance
against the real set.

Each knob was A/B'd individually (BASELINE.md); this measures the COMBINED
preset the `--configs config_fast` user actually runs (+37% throughput at
512^2), since speed/quality trades need not compose linearly.

    python tools/preset_ab.py [--epochs 2500] [--seed 1] [--out /tmp/preset_ab]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from precision_ab import make_quality_ab_parser, run_quality_ab  # noqa: E402


def main():
    args = make_quality_ab_parser('/tmp/preset_ab').parse_args()
    run_quality_ab(args,
                   arms=[('default', {}),
                         ('preset', {'compute_dtype': 'mixed',
                                     'gp_reuse_fakes': True})],
                   verdict_ok='preset_ok', verdict_worse='preset_worse')


if __name__ == '__main__':
    main()
