"""Pytree helpers for streaming state.

All streaming state in moshi_tpu is a pytree of arrays carrying a batch
axis.  Partial (per-slot) reset — the TPU equivalent of the reference's
`reset_streaming(reset_mask)` (moshi/moshi/modules/streaming.py:183-211) —
is a masked select between the live state and a freshly initialised state;
per-slot extract/insert (session resume) are gathers/scatters on the same
axis.

The batch axis is NOT always leading: stacked-layer caches are [L, B, ...].
A shape heuristic cannot locate it in general — at B == num_layers a KV
leaf [L, B, cap, H, hd] is ambiguous with the layer axis, and a conv tail
[B, K, C] collides the other way (found live: B=8 with the 8-layer
full-size Mimi transformer made the heuristic reset whole LAYERS across
every slot).  `batch_axes` derives the axis structurally instead: build the
same state at two batch sizes with `jax.eval_shape` (no allocation) and the
axis whose size differs is the batch axis.
"""

import jax
import jax.numpy as jnp


def batch_axes(tree_b1, tree_b2):
    """Leaf-wise batch-axis tree from the same state pytree shape-evaluated
    at two different batch sizes.  None for leaves without a batch axis
    (e.g. a shared rng key)."""
    def _axis(a, b):
        assert len(a.shape) == len(b.shape), (a.shape, b.shape)
        diff = [i for i, (x, y) in enumerate(zip(a.shape, b.shape)) if x != y]
        if not diff:
            return None
        assert len(diff) == 1, f"multiple batch-dependent axes: {a.shape} vs {b.shape}"
        return diff[0]
    return jax.tree.map(_axis, tree_b1, tree_b2)


def state_batch_axes(init_fn):
    """Convenience: batch-axis tree for `init_fn(batch_size) -> state`,
    computed without allocating anything."""
    return batch_axes(jax.eval_shape(lambda: init_fn(1)),
                      jax.eval_shape(lambda: init_fn(2)))


def expand_mask(mask: jax.Array, ndim: int, axis: int = 0) -> jax.Array:
    """Reshape a [B] bool mask to broadcast against `ndim` dims with the
    batch at `axis`."""
    shape = (1,) * axis + mask.shape + (1,) * (ndim - axis - 1)
    return mask.reshape(shape)


def _heuristic_axis(s, batch: int):
    if s.ndim >= 1 and s.shape[0] == batch:
        return 0
    if s.ndim >= 2 and s.shape[1] == batch:
        return 1
    raise ValueError(f"cannot locate batch axis in state leaf {s.shape} "
                     f"(B={batch})")


def masked_reset(state, init_state, reset_mask: jax.Array, axes=None):
    """Where `reset_mask[b]` is True, replace batch entry `b` of every leaf
    of `state` with the corresponding entry of `init_state`.

    `axes` (from batch_axes/state_batch_axes) locates each leaf's batch
    axis exactly; leaves with axis None (no batch axis) are left untouched.
    Without `axes` a shape heuristic is used — only safe when the batch
    size cannot collide with a layer-stack or kernel dimension."""
    B = reset_mask.shape[0]

    def _reset(s, i, ax):
        if ax is None:
            return s
        return jnp.where(expand_mask(reset_mask, s.ndim, ax), i, s)

    if axes is None:
        axes = jax.tree.map(lambda s: _heuristic_axis(s, B), state)
    return jax.tree.map(_reset, state, init_state, axes)


def take_slots(state, idx: jax.Array, batch: int, axes=None):
    """Gather batch entries `idx` ([N] int32) from every leaf of `state`,
    keeping a size-N batch axis — the per-slot state extraction used for
    session snapshots.  Leaves with axis None are passed through whole."""
    def _take(s, ax):
        if ax is None:
            return s
        return jnp.take(s, idx, axis=ax)

    if axes is None:
        axes = jax.tree.map(lambda s: _heuristic_axis(s, batch), state)
    return jax.tree.map(_take, state, axes)


def put_slots(state, slot_state, idx: jax.Array, batch: int, axes=None):
    """Inverse of take_slots: scatter `slot_state` (size-N batch axis) into
    batch entries `idx` of `state`.  Call inside a donated jit — a host-side
    scatter would materialize a full second state next to the live one."""
    def _put(s, v, ax):
        if ax is None:
            return s
        return s.at[(slice(None),) * ax + (idx,)].set(v)

    if axes is None:
        axes = jax.tree.map(lambda s: _heuristic_axis(s, batch), state)
    return jax.tree.map(_put, state, slot_state, axes)
