#!/usr/bin/env python
"""Dump and summarize the compiled HLO of the production 512^2 train chunk.

Prints every materialized layout op (reshape / transpose / copy / scatter /
gather) above a size threshold with its shape, sorted by byte size — the
ground truth for which layout ops actually exist after XLA fusion, to be
read alongside tools/op_trace.py's device-time view.

    python tools/hlo_inspect.py [--phase 5] [--min-mb 1] [--dump /tmp/hlo.txt]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def build_lowered(phase):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import neuron_gan_tpu
    neuron_gan_tpu.enable_compilation_cache()
    from neuron_gan_tpu.models import (
        init_generator_pg, init_discriminator_pg)
    from neuron_gan_tpu.train_step import (
        make_epoch_runner, make_optimizer, init_train_state)
    from neuron_gan_tpu.flagship import flagship_config, flagship_chunk_spec

    cfg = flagship_config()
    spec = flagship_chunk_spec(phase)
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = init_generator_pg(kg, cfg)
    d = init_discriminator_pg(kd, cfg)
    state = init_train_state(g, d, make_optimizer())
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((16, 768, 768, 1)).astype(np.float32))
    runner = make_epoch_runner(cfg, spec, n_epochs=2, donate=False)
    return runner.lower(state, images, jax.random.PRNGKey(0), 1)


_SHAPE = re.compile(r'([a-z0-9]+)\[([\d,]*)\]')
_BYTES = {'f32': 4, 'bf16': 2, 's32': 4, 'u32': 4, 'pred': 1, 'f16': 2,
          'u8': 1, 's8': 1, 'u64': 8, 's64': 8, 'f64': 8}


def shape_bytes(sig):
    m = _SHAPE.search(sig)
    if not m:
        return 0, ''
    dtype, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(','):
        if d:
            n *= int(d)
    return n * _BYTES.get(dtype, 4), m.group(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--phase', type=int, default=5)
    ap.add_argument('--min-mb', type=float, default=1.0)
    ap.add_argument('--dump', default='')
    ap.add_argument('--kinds', default='reshape,transpose,copy,scatter,'
                                       'gather,dynamic-update-slice')
    args = ap.parse_args()

    lowered = build_lowered(args.phase)
    txt = lowered.compile().as_text()
    if args.dump:
        with open(args.dump, 'w') as f:
            f.write(txt)
        print(f'# wrote {len(txt) / 1e6:.1f} MB HLO to {args.dump}')

    kinds = tuple(k.strip() for k in args.kinds.split(','))
    kind_re = re.compile(r'(%?[\w.\-]+) = (\S+) ('
                         + '|'.join(re.escape(k) for k in kinds) + r')\(')
    rows = []
    for line in txt.splitlines():
        s = line.strip()
        m = kind_re.match(s)
        if not m:
            continue
        nbytes, shape = shape_bytes(m.group(2))
        if nbytes < args.min_mb * 1e6:
            continue
        rows.append((nbytes, m.group(3), shape, m.group(1)[:90]))
    rows.sort(reverse=True)
    print(f'# materialized {"/".join(kinds)} ops >= {args.min_mb} MB '
          f'(standalone HLO instructions only; ops fused into loop fusions '
          f'do not appear here)')
    for nbytes, kind, shape, name in rows[:60]:
        print(f'{nbytes / 1e6:9.1f} MB  {kind:22s} {shape:28s} {name}')
    print(f'# total: {len(rows)} ops, '
          f'{sum(r[0] for r in rows) / 1e6:.0f} MB')


if __name__ == '__main__':
    main()
