"""Precision-pinned matmul helpers.

JAX's default matmul precision truncates float32 operands to bfloat16 on the
MXU, which breaks Mimi token-exactness (the codec checkpoint is f32 and the
RVQ argmin is sensitive to ~1e-3 perturbations).  All matmuls/convs in this
package go through these helpers with Precision.HIGHEST: full f32 for f32
operands, and a no-op for bf16 operands (the LM hot path), so the 7B decode
speed is unaffected.
"""

import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def dot(x, w):
    return jnp.matmul(x, w, precision=HIGHEST)


def einsum(subscripts, *operands, **kwargs):
    kwargs.setdefault("precision", HIGHEST)
    return jnp.einsum(subscripts, *operands, **kwargs)
