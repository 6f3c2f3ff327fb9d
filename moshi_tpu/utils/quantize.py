"""Weight-only int8 quantization.

Reference capability: PyTorch int8 via bitsandbytes
(`moshi/moshi/utils/quantize.py:13-57`, vectorwise per-output-channel),
Rust q8 gguf, MLX q4/q8.  TPU-native design: symmetric per-output-channel
int8 `QTensor` pytree nodes; the dequant (`convert * scale`) fuses into the
consuming matmul's operand read under XLA, so HBM traffic per weight is one
int8 byte — halving both memory footprint and the bandwidth-bound decode
time vs bf16.  Linears only (embeddings and norms stay in bf16/f32), like
the reference's `replace_linear_with_qlinear`.

int4 (`mode="int4"`, `QTensor4`): MLX-q4/gguf-style group-wise 4-bit with
nibble packing.  Quarter-size weights (7B ~3.8 GB); on TPU the fused Pallas
kernel (`ops/q4matmul.py`, int4-bitcast + per-group post-dot scaling) makes
q4 the FASTEST weight format too (~430 GB/s effective vs ~580 GB/s on twice
the bytes for XLA's int8 dequant path).  The XLA fallback (`astype`)
materializes the unpack and is only for CPU/tests.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Symmetric int8 weight with per-output-channel scales.

    q: int8 [..., in, out]; scale: f32 [..., 1, out].
    """

    q: jax.Array
    scale: jax.Array

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    def __getitem__(self, idx):
        return QTensor(self.q[idx], self.scale[idx])

    def take(self, indices, axis: int = 0):
        return QTensor(jnp.take(self.q, indices, axis=axis),
                       jnp.take(self.scale, indices, axis=axis))

    def astype(self, dtype):
        """Dequantize.  XLA fuses this into the consuming dot."""
        return (self.q.astype(dtype) * self.scale.astype(dtype))


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor4:
    """Group-wise 4-bit weight (analog of MLX q4 gs=32 / gguf q4), nibble-
    packed into int8 (two values per byte — native int4 arrays cannot cross
    the jit boundary on every backend, and not the axon transfer layer).

    Sequential-pair packing: the byte at packed row i holds logical din
    position 2i in the LOW nibble and 2i+1 in the HIGH nibble.  This matches
    Mosaic's native int4 sublane interleave, so the fused kernel
    (`ops/q4matmul.py`) reinterprets a packed block as the int4 weight block
    with a single `pltpu.bitcast` — zero unpack arithmetic on the VPU.

    q: int8 [..., in/2, out]; scale: f32 [..., in/gs, 1, out] (group g of the
    scale covers din positions [g*gs, (g+1)*gs)).  Logical shape is
    [..., in, out].
    """

    q: jax.Array
    scale: jax.Array

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        *lead, p2, dout = self.q.shape
        return tuple(lead) + (p2 * 2, dout)

    @property
    def ndim(self):
        return self.q.ndim

    def __getitem__(self, idx):
        return QTensor4(self.q[idx], self.scale[idx])

    def take(self, indices, axis: int = 0):
        return QTensor4(jnp.take(self.q, indices, axis=axis),
                        jnp.take(self.scale, indices, axis=axis))

    def astype(self, dtype):
        low, high = unpack_nibbles(self.q)
        *lead, p2, dout = self.q.shape
        # interleave: logical row 2i = low nibble of packed row i, 2i+1 = high
        w = jnp.stack([low, high], axis=-2).reshape(*lead, p2 * 2, dout)
        G = self.scale.shape[-3]
        w = w.reshape(*lead, G, 2 * p2 // G, dout).astype(dtype)
        w = w * self.scale.astype(dtype)
        return w.reshape(*lead, p2 * 2, dout)


class QTensor4Ref:
    """Lazy view selecting one member of a STACKED QTensor4 by a traced
    index, without materializing the slice.

    A pallas operand cannot fuse a dynamic-slice: feeding `stack[l]` to the
    q4 kernel makes XLA copy the whole member out of HBM first (~100 MB/layer
    on the 7B — ~5 ms/frame over the 32-layer scan at B=1, measured).  The
    ref instead carries the full stack plus the member index; `wdot` routes
    it to `q4gemm_stacked`, whose scalar-prefetch index maps DMA blocks of
    the selected member directly (same lesson as the int4 KV cache,
    ops/int4_attention.py).

    q: [N, din/2, dout] (leading axes flattened); scale: [N, G, 1, dout];
    idx: traced flat index; lead: remaining STATIC axes still to be indexed
    (e.g. the per-step W axis) — `ref[i]` folds them into idx.
    Not a pytree: built inside traces only (scan bodies), never stored.
    """

    def __init__(self, q: jax.Array, scale: jax.Array, idx, lead=()):
        self.q, self.scale, self.idx, self.lead = q, scale, idx, tuple(lead)

    @classmethod
    def from_stack(cls, qt: QTensor4, idx):
        """View member `idx` of the leading axis of a stacked QTensor4
        (q [L, *lead, din/2, dout])."""
        L, *lead, p2, dout = qt.q.shape
        G = qt.scale.shape[-3]
        n = 1
        for s in lead:
            n *= s
        q3 = qt.q.reshape(L * n, p2, dout)
        s4 = qt.scale.reshape(L * n, G, 1, dout)
        return cls(q3, s4, idx * n, lead)

    @property
    def shape(self):
        _, p2, dout = self.q.shape
        return self.lead + (2 * p2, dout)

    @property
    def ndim(self):
        return len(self.shape)

    def __getitem__(self, i):
        assert self.lead, "fully-indexed ref"
        assert isinstance(i, int), i
        stride = 1
        for s in self.lead[1:]:
            stride *= s
        return QTensor4Ref(self.q, self.scale, self.idx + i * stride,
                           self.lead[1:])

    def astype(self, dtype):
        """Materializing fallback (CPU/tests): dequantize the member."""
        assert not self.lead, "index the lead axes first"
        q = jax.lax.dynamic_index_in_dim(self.q, self.idx, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(self.scale, self.idx, 0,
                                         keepdims=False)
        return QTensor4(q, s).astype(dtype)


def repack_legacy_q4(q: jax.Array, scale: jax.Array) -> QTensor4:
    """Convert a round-2 two-plane packed q4 leaf (q [..., in/(2*gs), gs,
    out], where packed byte i held logical position i low / i + din/2 high)
    to the sequential-pair format.  Detection: legacy q has one more axis
    than the logical tensor (q.ndim == scale.ndim), the new format one less.
    """
    low, high = unpack_nibbles(q)
    *lead, p, gs, dout = q.shape
    w = jnp.concatenate([low.reshape(*lead, p * gs, dout),
                         high.reshape(*lead, p * gs, dout)], axis=-2)
    pairs = w.reshape(*lead, p * gs, 2, dout)
    even, odd = pairs[..., 0, :], pairs[..., 1, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(even, 0x0F),
                            jnp.left_shift(jnp.bitwise_and(odd, 0x0F), 4)
                            ).astype(jnp.int8)
    return QTensor4(packed, scale)


def unpack_nibbles(q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sign-extend the two 4-bit planes of a packed byte array (int32 math —
    int8 shifts lower poorly on the TPU VPU)."""
    x = q.astype(jnp.int32)
    low = jnp.bitwise_xor(jnp.bitwise_and(x, 0xF), 8) - 8
    high = jnp.bitwise_xor(jnp.bitwise_and(jnp.right_shift(x, 4), 0xF), 8) - 8
    return low, high


def take0(w, indices):
    """jnp.take along axis 0 for arrays or structured weight leaves
    (QTensor, QTensor4, LoRAWeight — anything with a .take pytree method)."""
    if isinstance(w, (QTensor, QTensor4)):
        return w.take(indices, axis=0)
    if hasattr(w, "tree_flatten") and hasattr(w, "take"):
        return w.take(indices, axis=0)
    return jnp.take(w, indices, axis=0)


def quantize_tensor(w: jax.Array) -> QTensor:
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale)


def quantize_tensor4(w: jax.Array, group_size: int = 32) -> QTensor4:
    *lead, din, dout = w.shape
    assert din % (2 * group_size) == 0, (din, group_size)
    wf = w.astype(jnp.float32).reshape(*lead, din // group_size, group_size, dout)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    # sequential-pair packing: packed row i = (pos 2i low nibble, 2i+1 high)
    q = q.reshape(*lead, din // 2, 2, dout)
    low = q[..., 0, :]
    high = q[..., 1, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(low, 0x0F),
                            jnp.left_shift(jnp.bitwise_and(high, 0x0F), 4)
                            ).astype(jnp.int8)
    return QTensor4(packed, scale)


# Param-tree paths that hold linear weights (see models/lm.py param layout).
_LINEAR_KEYS = ("in_proj", "out_proj", "linear_in", "linear_out", "linear1",
                "linear2", "q_proj", "kv_proj")


def quantize_lm_params(params: dict, min_size: int = 1 << 16,
                       mode: str = "int8", group_size: int = 32) -> dict:
    """Quantize all transformer linears + big projection stacks of an LM param
    tree to int8 (per-output-channel) or int4 (group-wise, MLX-q4-style)
    QTensors.  Embeddings, norms, and small tensors stay as-is."""
    assert mode in ("int8", "int4"), mode

    def walk(tree, path=()):
        if isinstance(tree, (QTensor, QTensor4)):
            return tree
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, path + (str(i),)) for i, v in enumerate(tree))
        x = tree
        if not hasattr(x, "ndim") or x.ndim < 2 or x.size < min_size:
            return x
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        name = path[-1] if path else ""
        parent = path[-2] if len(path) >= 2 else ""
        grandparent = path[-3] if len(path) >= 3 else ""
        is_linear = (name in _LINEAR_KEYS
                     or (name == "weight" and parent in
                         ("text_linear", "depformer_in", "linears", "extra_heads",
                          "input_proj"))
                     or grandparent == "output_projs")
        if is_linear:
            # Mixed precision in int4 mode: the depformer runs 8 sequential
            # inner steps of tiny matmuls per frame (latency-bound, ~6% of
            # weight bytes) where the q4 kernel's per-call overhead exceeds
            # its bandwidth saving (measured v5e, B=8: dep q4 cost ~+6 ms
            # vs int8) — keep it int8; the bandwidth-bound temporal
            # transformer and vocab head get q4.
            is_depformer = any(part.startswith("depformer") for part in path) \
                or "linears" in path
            if (mode == "int4" and not is_depformer
                    and x.shape[-2] % (2 * group_size) == 0):
                return quantize_tensor4(x, group_size)
            return quantize_tensor(x)
        return x

    return walk(params)
