"""Rotary position embedding.

Matches the reference numerics (`moshi/moshi/modules/rope.py:11-82`): rotation
math in float32, frequencies `exp(arange(D/2) * (-log(max_period) * 2 / D))`,
per-batch-entry integer offsets, interleaved ([r0,i0,r1,i1,...]) or concat
([r..., i...]) halves.
"""

import math

import jax
import jax.numpy as jnp


def apply_rope(q: jax.Array, k: jax.Array, offset: jax.Array, *,
               max_period: float = 10_000.0, interleave: bool = True
               ) -> tuple[jax.Array, jax.Array]:
    """q, k: [B, H, T, D]; offset: [B] integer positions of the first step."""
    B, H, T, D = q.shape
    assert D % 2 == 0
    dtype = q.dtype

    ds = jnp.arange(D // 2, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-math.log(max_period) * 2 / D))
    ts = offset.astype(jnp.float32).reshape(-1, 1) + jnp.arange(T, dtype=jnp.float32)
    ts = ts.reshape(B, 1, T, 1)

    rotr = jnp.cos(freqs * ts)  # [B, 1, T, D/2]
    roti = jnp.sin(freqs * ts)

    def rotate(x):
        if interleave:
            xr = x[..., 0::2].astype(jnp.float32)
            xi = x[..., 1::2].astype(jnp.float32)
        else:
            xr = x[..., : D // 2].astype(jnp.float32)
            xi = x[..., D // 2:].astype(jnp.float32)
        yr = xr * rotr - xi * roti
        yi = xr * roti + xi * rotr
        if interleave:
            y = jnp.stack([yr.astype(dtype), yi.astype(dtype)], axis=-1)
            return y.reshape(*x.shape[:-1], D)
        return jnp.concatenate([yr.astype(dtype), yi.astype(dtype)], axis=-1)

    return rotate(q), rotate(k)
