"""Shared serving-configuration knobs.

Every serving/bench entry point exposes the same four capacity levers
(BENCH_BATCH.md / BENCH_TTS_ASR.md):
- kv_cache: "model" | "int8" | "int4" — per-user KV cache dtype;
- context:  bound the attention window (per-user KV memory scales with it);
- weights:  "int8" | "int4" — re-quantize LM weights after load;
- mimi_dtype: "bf16" halves the codec share of the frame at large batch
  (codes not bit-exact — QUALITY.md).

One helper so the worker TOML, the CLI servers and the benchmarks cannot
drift in how they apply them.
"""

import jax
import jax.numpy as jnp


def resolve_mimi_dtype(mimi_dtype) -> jnp.dtype:
    """"f32"/"bf16" strings (TOML/CLI) or an actual dtype -> jnp.dtype."""
    if mimi_dtype is None:
        return jnp.dtype(jnp.float32)
    if isinstance(mimi_dtype, str):
        return jnp.dtype({"f32": jnp.float32, "float32": jnp.float32,
                          "bf16": jnp.bfloat16,
                          "bfloat16": jnp.bfloat16}[mimi_dtype])
    return jnp.dtype(mimi_dtype)


def override_lm(lm, kv_cache: str | None = None, context: int | None = None):
    """Rebuild the LMModel with a kv_cache dtype / context override."""
    if not (kv_cache or context):
        return lm
    from dataclasses import replace
    from ..models.lm import LMModel
    cfg = lm.config
    if kv_cache:
        cfg = replace(cfg, kv_cache_dtype=kv_cache)
    if context:
        cfg = replace(cfg, context=int(context))
    return LMModel(cfg)


def cast_mimi_params(mimi_params, mimi_dtype):
    """Cast floating Mimi params to mimi_dtype (no-op for f32)."""
    md = resolve_mimi_dtype(mimi_dtype)
    if md == jnp.float32 or mimi_params is None:
        return mimi_params
    return jax.tree.map(
        lambda x: x.astype(md) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        mimi_params)


def apply_serving_overrides(lm, lm_params=None, mimi_params=None, *,
                            kv_cache: str | None = None,
                            context: int | None = None,
                            weights: str | None = None,
                            mimi_dtype=None):
    """Apply all four knobs.  Returns (lm, lm_params, mimi_params, mimi_dtype)
    with mimi_dtype resolved to a jnp.dtype."""
    lm = override_lm(lm, kv_cache, context)
    if weights and lm_params is not None:
        from .quantize import quantize_lm_params
        lm_params = quantize_lm_params(lm_params, mode=weights)
    md = resolve_mimi_dtype(mimi_dtype)
    return lm, lm_params, cast_mimi_params(mimi_params, md), md
