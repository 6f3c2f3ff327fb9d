"""Device mesh + sharding rules.

The reference is a single-device inference codebase (its only distributed
code is the RVQ EMA all_reduce, `moshi/moshi/quantization/core_vq.py:58-75`);
multi-chip support here is a new TPU-native design, not a port: a
("dp", "tp") `jax.sharding.Mesh`, Megatron-style tensor parallel over the
transformer's projection matrices (column-parallel qkv/ffn-in, row-parallel
out/ffn-out), data parallel over batch, and XLA GSPMD inserting the ICI
collectives.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    """Build a (dp, tp) mesh over the first `n_devices` devices.  `tp`
    defaults to min(n_devices, 4) when unspecified."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    devices = np.asarray(devices[:n])
    if tp is None:
        tp = min(n, 4)
    assert n % tp == 0, (n, tp)
    return Mesh(devices.reshape(n // tp, tp), ("dp", "tp"))


def _divisible(dim: int, mesh: Mesh) -> bool:
    return dim % mesh.shape["tp"] == 0


def lm_param_spec(params, mesh: Mesh):
    """PartitionSpec tree for LM params: tensor-parallel over the obvious
    matmul axes when divisible, replicated otherwise.

    Conventions (see modules/transformer.py param layouts):
    - attn.in_proj  [L, W, d, qkv]  -> shard qkv (column parallel)
    - attn.out_proj [L, W, d, d]    -> shard d_in (row parallel)
    - mlp.linear_in [L, W, d, 2h]   -> shard 2h
    - mlp.linear_out[L, W, h, d]    -> shard h
    - embeddings / vocab heads      -> shard the embedding (last) axis
    """
    tp = mesh.shape["tp"]

    def spec_for(path: tuple, x) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        if x.ndim == 0:
            return P()
        last = x.shape[-1]
        second = x.shape[-2] if x.ndim >= 2 else 1
        if "attn" in joined and joined.endswith("in_proj"):
            return P(*(None,) * (x.ndim - 1), "tp") if last % tp == 0 else P()
        if "attn" in joined and joined.endswith("out_proj"):
            return P(*(None,) * (x.ndim - 2), "tp", None) if second % tp == 0 else P()
        if joined.endswith("mlp/linear_in"):
            return P(*(None,) * (x.ndim - 1), "tp") if last % tp == 0 else P()
        if joined.endswith("mlp/linear_out"):
            return P(*(None,) * (x.ndim - 2), "tp", None) if second % tp == 0 else P()
        if "linear1" in joined:
            return P(*(None,) * (x.ndim - 1), "tp") if last % tp == 0 else P()
        if "linear2" in joined:
            return P(*(None,) * (x.ndim - 2), "tp", None) if second % tp == 0 else P()
        if ("emb" in joined or "text_linear" in joined or "linears" in joined) and x.ndim >= 2:
            return P(*(None,) * (x.ndim - 1), "tp") if last % tp == 0 else P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Device-put params according to `lm_param_spec`."""
    specs = lm_param_spec(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_spec(mesh: Mesh) -> P:
    return P("dp")
