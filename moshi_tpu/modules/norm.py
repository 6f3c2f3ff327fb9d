"""Normalization layers.

Numerics match the reference exactly (`moshi/moshi/modules/transformer.py`):
- `layer_norm`: eps 1e-5, computed in input dtype (torch nn.LayerNorm).
- `layer_norm_f32`: eps 1e-8, input upcast to f32 (LayerNormF32, lines 29-33).
- `rms_norm`: eps 1e-5 *inside* the mean (lines 45-58: `var = eps + mean(x^2)`).
- `rms_norm_f32`: eps 1e-8, f32 compute (create_norm_fn, lines 125-136).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LayerNorm:
    dim: int
    eps: float = 1e-5
    f32: bool = False
    bias: bool = True

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        p = {"scale": jnp.ones((self.dim,), jnp.float32 if self.f32 else dtype)}
        if self.bias:
            p["bias"] = jnp.zeros((self.dim,), jnp.float32 if self.f32 else dtype)
        return p

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        if self.f32:
            x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * params["scale"].astype(y.dtype)
        if "bias" in params:
            y = y + params["bias"].astype(y.dtype)
        return y.astype(dtype)


@dataclass(frozen=True)
class RMSNorm:
    dim: int
    eps: float = 1e-5
    f32: bool = False

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        return {"scale": jnp.ones((self.dim,), jnp.float32 if self.f32 else dtype)}

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        if self.f32:
            x = x.astype(jnp.float32)
        # Reference: var = eps + mean(x**2); y = x * alpha * rsqrt(var)
        var = self.eps + jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        y = x * (params["scale"].astype(x.dtype) * jax.lax.rsqrt(var))
        return y.astype(dtype)


def make_norm(norm_type: str, dim: int):
    """Mirror of the reference `create_norm_fn` (transformer.py:115-136)."""
    if norm_type == "layer_norm":
        return LayerNorm(dim, eps=1e-5)
    if norm_type == "layer_norm_f32":
        return LayerNorm(dim, eps=1e-8, f32=True)
    if norm_type == "rms_norm":
        return RMSNorm(dim, eps=1e-5)
    if norm_type == "rms_norm_f32":
        return RMSNorm(dim, eps=1e-8, f32=True)
    raise ValueError(f"unknown norm type {norm_type}")


@dataclass(frozen=True)
class LayerScale:
    """Diagonal residual-branch rescale (transformer.py:80-112)."""

    channels: int
    init: float = 1e-4

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        return {"scale": jnp.full((self.channels,), self.init, dtype)}

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        return params["scale"].astype(x.dtype) * x
