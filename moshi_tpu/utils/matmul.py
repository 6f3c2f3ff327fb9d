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


def _largest_block(n: int, multiple: int, limit: int) -> int | None:
    """Largest divisor of n that is a multiple of `multiple` and <= limit."""
    best = None
    for b in range(multiple, min(limit, n) + 1, multiple):
        if n % b == 0:
            best = b
    return best


def wdot(x, w):
    """x @ w where w may be a quantized QTensor/QTensor4 leaf [din, dout].

    QTensor4 on TPU routes through the fused Pallas unpack-matmul
    (`ops/q4matmul.py`), keeping HBM weight traffic at 0.5 bytes/element;
    everywhere else the dequant `astype` is left to XLA (which fuses the
    int8 convert into the dot but materializes the q4 unpack).

    LoRAWeight leaves compute `wdot(x, stop_grad(base)) + (x@a)@b * scaling`
    (reference lora.py:116-118 with frozen_W)."""
    from .quantize import QTensor4, QTensor4Ref
    from ..models.lora import LoRAWeight  # lazy: lora imports this module
    if isinstance(w, LoRAWeight):
        import jax
        base = jax.tree.map(jax.lax.stop_gradient, w.base)
        y = wdot(x, base)
        delta = dot(dot(x, w.a.astype(x.dtype)), w.b.astype(x.dtype))
        return y + (w.scaling * delta).astype(y.dtype)
    if isinstance(w, QTensor4Ref) and not w.lead:
        from ..ops.q4matmul import q4gemm_stacked, use_pallas, block_limits
        din, dout = w.shape
        if use_pallas():
            import math as _math
            gs = din // w.scale.shape[-3]
            lim_in, lim_out = block_limits()
            bi = _largest_block(din, _math.lcm(gs, 128), lim_in)
            bo = _largest_block(dout, 128, lim_out)
            if bi is not None and bo is not None:
                lead = x.shape[:-1]
                y = q4gemm_stacked(x.reshape(-1, din), w.q, w.scale,
                                   w.idx, block_in=bi, block_out=bo)
                return y.reshape(*lead, dout)
        return dot(x, w.astype(x.dtype))
    if isinstance(w, QTensor4):
        from ..ops.q4matmul import q4gemm, use_pallas, block_limits
        din, dout = w.shape[-2:]
        if use_pallas() and w.q.ndim == 2:
            import math as _math
            gs = din // w.scale.shape[-3]
            lim_in, lim_out = block_limits()
            # block_in must be a lane-aligned (128) multiple of the group size
            bi = _largest_block(din, _math.lcm(gs, 128), lim_in)
            bo = _largest_block(dout, 128, lim_out)
            if bi is not None and bo is not None:
                lead = x.shape[:-1]
                y = q4gemm(x.reshape(-1, din), w.q, w.scale,
                           block_in=bi, block_out=bo)
                return y.reshape(*lead, dout)
    return dot(x, w.astype(x.dtype))
