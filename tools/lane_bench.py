"""Microbenchmark: is the packed 64-channel conv paying 2x HBM for lane padding?

Shapes (bf16, 3x3 SAME conv, NHWC):
  A: (8,256,256, 64)-> 64   today's packed top-phase block at 512^2
  B: (8,256,128,128)->128   same element count, lanes full, 2x the FLOPs
  C: (8,128,128,128)->128   half the elements; equals A's PADDED bytes if
                            A pads 64->128 lanes
If time(A) ~= time(C) and time(B) ~= time(A): padding is the story.
If time(A) ~= time(C)*2: no padding; A is already byte-optimal.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from functools import partial


def make(shape_in, cout, iters):
    b, h, w, cin = shape_in
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
    wt = (jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
          * (0.1 / np.sqrt(9 * cin)).astype(np.float32).item())

    @jax.jit
    def run(x, wt):
        def body(y, _):
            y = lax.conv_general_dilated(
                y, wt, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return y, ()
        y, _ = lax.scan(body, x, None, length=iters)
        return jnp.float32(y).mean()

    return run, x, wt


def bench(name, shape_in, cout, iters=30):
    run, x, wt = make(shape_in, cout, iters)
    np.asarray(run(x, wt))          # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x, wt))
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    b, h, w, cin = shape_in
    useful = (b * h * w * cin * 2 * 2)            # read x + write y, bf16
    flops = 2 * b * h * w * 9 * cin * cout
    print(f'{name}: {per*1e3:.3f} ms/conv  useful {useful/per/1e9:.0f} GB/s '
          f'  {flops/per/1e12:.1f} TFLOPS', flush=True)
    return per


def bench_chain(iters=20):
    """The realistic gen-block chain (conv->lrelu->pixelnorm x2) at the
    512^2 top-phase shape (C=16, batch 8) in the 2x2 vs 2x4 packed layout,
    forward and forward+backward, bf16 activations / f32 params — the
    end-to-end gate for the full-lane repack lever."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
    from neuron_gan_tpu.ops import packed as pk

    key = jax.random.PRNGKey(0)
    c = 16
    x = jax.random.normal(key, (8, 512, 512, c), jnp.bfloat16)
    p1 = {'w': jax.random.normal(key, (3, 3, c, c)) * 0.2}
    p2 = {'w': jax.random.normal(key, (3, 3, c, c)) * 0.2}

    def block4(x4, p1, p2):
        def stage(y, p):
            y = pk.packed_equalized_conv3x3(y, p)
            y = jnp.where(y > 0, y, 0.2 * y)
            return pk.packed_pixel_norm_mxu(y, f32_stats=True)
        return stage(stage(x4, p1), p2)

    def block8(x8, p1, p2):
        def stage(y, p):
            y = pk.packed8_equalized_conv3x3(y, p)
            y = jnp.where(y > 0, y, 0.2 * y)
            return pk.packed8_pixel_norm_mxu(y, f32_stats=True)
        return stage(stage(x8, p1), p2)

    x4 = pk.space_to_depth(x)
    x8 = pk.space_to_depth_w(x4)

    def timed(tag, fn, *args):
        run = jax.jit(lambda *a: lax.scan(
            lambda y, _: (fn(y, *a[1:]), ()), a[0], None,
            length=iters)[0].astype(jnp.float32).mean())
        np.asarray(run(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            best = min(best, time.perf_counter() - t0)
        print(f'{tag}: {best/iters*1e3:.3f} ms/block', flush=True)
        return best / iters

    def timed_grad(tag, fn, *args):
        def loss(x_, p1_, p2_):
            return fn(x_, p1_, p2_).astype(jnp.float32).mean()
        g = jax.grad(loss, argnums=(0, 1, 2))

        def body(y, _):
            dy, d1, d2 = g(y, args[1], args[2])
            return y + dy.astype(y.dtype) * 0, (d1['w'].mean(),)
        run = jax.jit(lambda *a: lax.scan(body, a[0], None,
                                          length=iters)[1][0].sum())
        np.asarray(run(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            best = min(best, time.perf_counter() - t0)
        print(f'{tag}: {best/iters*1e3:.3f} ms/block', flush=True)
        return best / iters

    f4 = timed('fwd      2x2 (64ch)', block4, x4, p1, p2)
    f8 = timed('fwd      2x4 (128ch)', block8, x8, p1, p2)
    g4 = timed_grad('fwd+bwd  2x2 (64ch)', block4, x4, p1, p2)
    g8 = timed_grad('fwd+bwd  2x4 (128ch)', block8, x8, p1, p2)
    print(f'fwd speedup 2x4/2x2: {f4/f8:.2f}x   fwd+bwd: {g4/g8:.2f}x')


if __name__ == '__main__':
    if '--chain' in sys.argv:
        bench_chain()
        sys.exit(0)
    a = bench('A  64ch 256x256', (8, 256, 256, 64), 64)
    b = bench('B 128ch 256x128', (8, 256, 128, 128), 128)
    c = bench('C 128ch 128x128', (8, 128, 128, 128), 128)
    print(f'A/C ratio: {a/c:.2f}  (2.0 => no padding waste; 1.0 => 2x padding)')
    print(f'B/A ratio: {b/a:.2f}  (<1 => full-lane layout wins at equal bytes)')
