"""Pytree helpers for streaming state.

All streaming state in moshi_tpu is a pytree of arrays whose leading axis is
the batch dimension.  Partial (per-slot) reset — the TPU equivalent of the
reference's `reset_streaming(reset_mask)` (moshi/moshi/modules/streaming.py:183-211)
— is a masked select between the live state and a freshly initialised state.
"""

import jax
import jax.numpy as jnp


def expand_mask(mask: jax.Array, ndim: int) -> jax.Array:
    """Reshape a [B] bool mask to [B, 1, 1, ...] with `ndim` dims for broadcasting."""
    return mask.reshape(mask.shape + (1,) * (ndim - 1))


def take_slots(state, idx: jax.Array, batch: int):
    """Gather batch entries `idx` ([N] int32) from every leaf of `state`,
    keeping a size-N batch axis — the per-slot state extraction used for
    session snapshots.  Batch-axis heuristic as in masked_reset."""
    def _take(s):
        if s.ndim >= 1 and s.shape[0] == batch:
            return s[idx]
        if s.ndim >= 2 and s.shape[1] == batch:
            return s[:, idx]
        raise ValueError(f"cannot locate batch axis in state leaf {s.shape} "
                         f"(B={batch})")
    return jax.tree.map(_take, state)


def put_slots(state, slot_state, idx: jax.Array, batch: int):
    """Inverse of take_slots: scatter `slot_state` (size-N batch axis) into
    batch entries `idx` of `state`.  Call inside a donated jit — a host-side
    scatter would materialize a full second state next to the live one."""
    def _put(s, v):
        if s.ndim >= 1 and s.shape[0] == batch:
            return s.at[idx].set(v)
        if s.ndim >= 2 and s.shape[1] == batch:
            return s.at[:, idx].set(v)
        raise ValueError(f"cannot locate batch axis in state leaf {s.shape} "
                         f"(B={batch})")
    return jax.tree.map(_put, state, slot_state)


def masked_reset(state, init_state, reset_mask: jax.Array):
    """Where `reset_mask[b]` is True, replace batch entry `b` of every leaf of
    `state` with the corresponding entry of `init_state`.

    Leaves whose leading dim is not the batch size (e.g. stacked-layer caches
    of shape [L, B, ...]) are handled by broadcasting the mask against the
    first axis that matches the batch size.
    """
    B = reset_mask.shape[0]

    def _reset(s, i):
        if s.ndim >= 1 and s.shape[0] == B:
            m = expand_mask(reset_mask, s.ndim)
        elif s.ndim >= 2 and s.shape[1] == B:
            m = expand_mask(reset_mask, s.ndim - 1)[None]
        else:
            raise ValueError(f"cannot locate batch axis in state leaf {s.shape} (B={B})")
        return jnp.where(m, i, s)

    return jax.tree.map(_reset, state, init_state)
