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


if __name__ == '__main__':
    a = bench('A  64ch 256x256', (8, 256, 256, 64), 64)
    b = bench('B 128ch 256x128', (8, 256, 128, 128), 128)
    c = bench('C 128ch 128x128', (8, 128, 128, 128), 128)
    print(f'A/C ratio: {a/c:.2f}  (2.0 => no padding waste; 1.0 => 2x padding)')
    print(f'B/A ratio: {b/a:.2f}  (<1 => full-lane layout wins at equal bytes)')
