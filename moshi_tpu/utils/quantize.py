"""Weight-only int8 quantization.

Reference capability: PyTorch int8 via bitsandbytes
(`moshi/moshi/utils/quantize.py:13-57`, vectorwise per-output-channel),
Rust q8 gguf, MLX q4/q8.  TPU-native design: symmetric per-output-channel
int8 `QTensor` pytree nodes; the dequant (`convert * scale`) fuses into the
consuming matmul's operand read under XLA, so HBM traffic per weight is one
int8 byte — halving both memory footprint and the bandwidth-bound decode
time vs bf16.  Linears only (embeddings and norms stay in bf16/f32), like
the reference's `replace_linear_with_qlinear`.
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


def take0(w, indices):
    """jnp.take along axis 0 for arrays or QTensors."""
    if isinstance(w, QTensor):
        return w.take(indices, axis=0)
    return jnp.take(w, indices, axis=0)


def quantize_tensor(w: jax.Array) -> QTensor:
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale)


# Param-tree paths that hold linear weights (see models/lm.py param layout).
_LINEAR_KEYS = ("in_proj", "out_proj", "linear_in", "linear_out", "linear1",
                "linear2")


def quantize_lm_params(params: dict, min_size: int = 1 << 16) -> dict:
    """Quantize all transformer linears + big projection stacks of an LM param
    tree to int8 QTensors.  Embeddings, norms, and small tensors stay as-is."""

    def walk(tree, path=()):
        if isinstance(tree, QTensor):
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
            return quantize_tensor(x)
        return x

    return walk(params)
