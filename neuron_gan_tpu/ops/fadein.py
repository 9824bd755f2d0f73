"""Fade-in blend used during progressive-growth transitions.

``out = start + alpha * (end - start)`` with a *traced* alpha scalar, so the
fade-in causes zero recompiles within a phase (reference semantics:
models.py:344-351 for the generator, :516-524 for the discriminator).
"""

import jax.numpy as jnp


def fade_in(start, end, alpha):
    alpha = jnp.asarray(alpha, start.dtype)
    return start + alpha * (end - start)
