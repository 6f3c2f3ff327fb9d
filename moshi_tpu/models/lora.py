"""LoRA adapters: fuse-at-load (serving) and runtime unfused (training).

Behavioral reference: `moshi/moshi/modules/lora.py` — `LoRALinear` computes
`y = x @ (W + scaling * B @ A)^T` (frozen W, A: [rank, in], B: [out, rank]);
`replace_all_linear_with_lora` swaps every nn.Linear (lora.py:5-22);
`replace_lora_with_linear` fuses the product back (lora.py:25-41).

TPU-native runtime form: `LoRAWeight` is a pytree weight leaf
`{base, a [din, r], b [r, dout]}` dispatched by `utils/matmul.wdot` as
`wdot(x, base) + (x @ a) @ b * scaling` with `stop_gradient` on the base —
so a plain `jax.grad` of the model only flows into the adapters (the
reference freezes `frozen_W` the same way).  `b` is zero-initialised so a
fresh adapter leaves the model's behavior unchanged (the reference relies on
loading already-trained adapters and keeps torch's default init).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..utils.matmul import dot
from ..utils.quantize import QTensor, QTensor4


@jax.tree_util.register_pytree_node_class
@dataclass
class LoRAWeight:
    """A linear weight with a low-rank residual adapter.

    base: [.., din, dout] array or QTensor/QTensor4 (frozen);
    a: [.., din, rank]; b: [.., rank, dout]; scaling static.
    """

    base: object
    a: jax.Array
    b: jax.Array
    scaling: float = 2.0

    def tree_flatten(self):
        return (self.base, self.a, self.b), self.scaling

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, scaling=aux)

    @property
    def shape(self):
        return self.base.shape

    @property
    def ndim(self):
        return self.base.ndim

    def __getitem__(self, idx):
        return LoRAWeight(self.base[idx], self.a[idx], self.b[idx], self.scaling)

    def take(self, indices, axis: int = 0):
        from ..utils.quantize import take0
        assert axis == 0
        return LoRAWeight(take0(self.base, indices),
                          jnp.take(self.a, indices, axis=0),
                          jnp.take(self.b, indices, axis=0), self.scaling)

    def astype(self, dtype):
        """Dense fused view (frozen base + adapter delta)."""
        base = jax.lax.stop_gradient(self.base.astype(dtype))
        delta = dot(self.a.astype(jnp.float32), self.b.astype(jnp.float32))
        return base + (self.scaling * delta).astype(dtype)


# Param-tree keys holding linear weights (mirrors the reference's
# replace_all_linear_with_lora recursing over nn.Linear).
_LORA_KEYS = ("in_proj", "out_proj", "linear_in", "linear_out", "linear1",
              "linear2", "q_proj", "kv_proj")
_LORA_WEIGHT_PARENTS = ("text_linear", "depformer_in", "linears", "input_proj")


def replace_all_linear_with_lora(params: dict, rank: int, key: jax.Array,
                                 scaling: float = 2.0,
                                 dtype=jnp.bfloat16) -> dict:
    """Wrap every linear weight leaf of an LM param tree in a LoRAWeight
    (reference lora.py:5-22).  Embeddings and norms stay plain."""
    counter = [0]

    def walk(tree, path=()):
        if isinstance(tree, LoRAWeight):
            return tree
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, path + (str(i),))
                              for i, v in enumerate(tree))
        name = path[-1] if path else ""
        parent = path[-2] if len(path) >= 2 else ""
        grandparent = path[-3] if len(path) >= 3 else ""
        is_linear = (name in _LORA_KEYS
                     or (name == "weight" and parent in _LORA_WEIGHT_PARENTS)
                     or grandparent == "output_projs")
        if not is_linear or not hasattr(tree, "ndim") or tree.ndim < 2:
            return tree
        *lead, din, dout = tree.shape
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        a = (jax.random.normal(k, (*lead, din, rank), jnp.float32)
             / jnp.sqrt(din)).astype(dtype)
        b = jnp.zeros((*lead, rank, dout), dtype)
        return LoRAWeight(tree, a, b, scaling)

    out = walk(params)
    assert counter[0] > 0, "no linear leaves found to adapt"
    return out


def fuse_lora_params(params: dict):
    """Fuse every LoRAWeight back into a dense weight
    (reference replace_lora_with_linear, lora.py:25-41)."""
    def fuse(leaf):
        if isinstance(leaf, LoRAWeight):
            dtype = (jnp.bfloat16 if isinstance(leaf.base, (QTensor, QTensor4))
                     else leaf.base.dtype)
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(fuse, params,
                        is_leaf=lambda x: isinstance(x, LoRAWeight))


def lora_labels(params: dict):
    """Label pytree: "adapter" for a/b leaves, "frozen" elsewhere — for
    `optax.multi_transform` so only adapters get optimizer state/updates and
    everything else is explicitly zeroed (NOTE: `optax.masked` alone is
    wrong here — it passes non-masked updates through *unchanged*, i.e. raw
    gradients would be applied to the frozen leaves)."""
    def mark(leaf):
        if isinstance(leaf, LoRAWeight):
            return LoRAWeight(jax.tree.map(lambda _: "frozen", leaf.base),
                              "adapter", "adapter", leaf.scaling)
        return "frozen"

    return jax.tree.map(mark, params,
                        is_leaf=lambda x: isinstance(x, LoRAWeight))


def fuse_lora_state(state: dict, lora_state: dict, scaling: float = 2.0) -> dict:
    """Fuse a LoRA safetensors state dict into the base (torch-format) state.

    Handles both split (`...in_projs.0.weight`) and fused legacy
    (`...in_proj_weight`) base naming for the attention projections.
    """
    state = dict(state)
    fused = 0
    for key in lora_state:
        if not key.endswith(".lora_A.weight"):
            continue
        base = key[: -len(".lora_A.weight")]
        A = lora_state[key]
        B = lora_state[base + ".lora_B.weight"]
        delta = (B.astype(jnp.float32) @ A.astype(jnp.float32)) * scaling
        for cand in (base + ".weight", base + "_weight"):
            if cand in state:
                w = state[cand]
                state[cand] = (w.astype(jnp.float32) + delta).astype(w.dtype)
                fused += 1
                break
        else:
            raise KeyError(f"no base weight found for LoRA adapter {base}")
    if fused == 0:
        raise ValueError("LoRA state dict contained no adapters")
    return state
