#!/usr/bin/env python
"""Op-level device-time breakdown of the production train chunk.

Captures a ``jax.profiler.trace`` of one warm 512^2 epoch-chunk call (the
same runner bench.py times) and prints per-op-category and top-K individual
op device self-times.  This is the measurement that says where the ~100 ms
step goes AFTER stage-level decomposition (tools/step_profile.py) — e.g.
how much is conv MACs vs elementwise pixelnorm chains vs the augmentation
gather vs kernel-pack scatters.

    python tools/op_trace.py [--phase 5] [--epochs 3] [--top 25]

Parsing uses tensorboard_plugin_profile's raw_to_tool_data on the xplane
protobuf ('framework_op_stats' tool), which reports device self-time per op
even through the axon relay.
"""

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def capture(phase, n_epochs, trace_dir, pallas_conv=False,
            packed_lanes='flagship', batch=8):
    import jax
    import jax.numpy as jnp
    import neuron_gan_tpu
    neuron_gan_tpu.enable_compilation_cache()
    from neuron_gan_tpu.models import (
        init_generator_pg, init_discriminator_pg)
    from neuron_gan_tpu.train_step import (
        make_epoch_runner, make_optimizer, init_train_state)
    from neuron_gan_tpu.flagship import flagship_config, flagship_chunk_spec

    cfg = flagship_config(**{
        **({'pallas_conv': True} if pallas_conv else {}),
        **({} if packed_lanes == 'flagship' else
           {'packed_lanes': packed_lanes})})
    if phase is None:
        phase = cfg.n_phases - 1
    n_images = max(16, batch)
    spec = flagship_chunk_spec(phase, batch_size=batch, n_images=n_images)

    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    state = init_train_state(init_generator_pg(kg, cfg),
                             init_discriminator_pg(kd, cfg), make_optimizer())
    rng = np.random.default_rng(0)
    # padded stack is always at the dataset max (512 + 2*128)
    images = jnp.asarray(rng.random((n_images, 768, 768, 1)).astype(np.float32))
    runner = make_epoch_runner(cfg, spec, n_epochs=n_epochs, donate=False)
    state, stats = runner(state, images, jax.random.PRNGKey(0), 1)  # compile
    np.asarray(stats)
    with jax.profiler.trace(trace_dir):
        state, stats = runner(state, images, jax.random.PRNGKey(1),
                              1 + n_epochs)
        np.asarray(stats)
    n_steps = n_epochs * (n_images // batch)
    return n_steps


def report(trace_dir, n_steps, top):
    # xprof ships pre-protoc-3.19 generated protos; the pure-python
    # implementation is the documented workaround (slower is fine for
    # offline parsing).  Must be set before any *_pb2 import.
    os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')
    from xprof.convert import raw_to_tool_data as rtd
    files = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    assert files, f'no xplane.pb under {trace_dir}'
    out, _ = rtd.xspace_to_tool_data(files, 'framework_op_stats', {})
    data = json.loads(out) if isinstance(out, (str, bytes)) else out
    # The tool returns gviz tables (per-op table first); rows of dicts.
    table = data[0] if isinstance(data, list) else data
    cols = [c['label'] for c in table['cols']]
    rows = [{c: v['v'] for c, v in zip(cols, r['c'])} for r in table['rows']]
    dev = [r for r in rows if r.get('Host/device') == 'Device']
    key_t = 'Total self-time (us)'
    by_cat = collections.Counter()
    for r in dev:
        by_cat[r.get('Operation Type', '?')] += float(r[key_t])
    total = sum(by_cat.values())
    print(f'# device self-time over {n_steps} steps; total '
          f'{total / 1e3 / n_steps:.2f} ms/step')
    print('\n## by category (ms/step)')
    for cat, us in by_cat.most_common():
        print(f'{us / 1e3 / n_steps:8.2f}  {cat}')
    print(f'\n## top {top} ops (ms/step; BW GB/s; bound-by)')
    dev.sort(key=lambda r: -float(r[key_t]))
    for r in dev[:top]:
        print(f"{float(r[key_t]) / 1e3 / n_steps:8.2f}  "
              f"{float(r.get('Measured Memory BW (GBytes/Sec)', 0)):7.1f}  "
              f"{str(r.get('Bound by', '?')):4}  "
              f"{str(r.get('Operation Name', '?'))[-100:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--phase', type=int, default=None)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--trace-dir', type=str, default=None)
    ap.add_argument('--pallas-conv', action='store_true',
                    help='route packed block convs through the fused '
                         'Pallas conv+lrelu+pixelnorm kernel')
    ap.add_argument('--lanes-64', action='store_true',
                    help='retired 2x2-only layout (packed_lanes=None); '
                         'the default traces the shipping packed_lanes=128')
    ap.add_argument('--batch', type=int, default=8,
                    help='batch size (8 = the reference geometry; mirrors '
                         'bench.py --batch for throughput-mode traces)')
    args = ap.parse_args()
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix='op_trace_')
    n_steps = capture(args.phase, args.epochs, trace_dir, args.pallas_conv,
                      None if args.lanes_64 else 'flagship', args.batch)
    report(trace_dir, n_steps, args.top)


if __name__ == '__main__':
    main()
