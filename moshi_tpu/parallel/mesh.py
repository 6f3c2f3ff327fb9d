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

    Quantized / adapter leaves (`QTensor`, `QTensor4`, `LoRAWeight`) are
    handled explicitly: the col/row decision is made on the LOGICAL weight
    shape, then expanded onto each child with its own trailing axes (e.g. a
    QTensor's per-output-channel scale [..., 1, out] shards its last axis
    under column parallelism but stays replicated under row parallelism —
    the deployments that actually need 2+ chips are exactly the int8/7B
    ones, so these leaves must not fall through to a mis-specced default).
    """
    from ..utils.quantize import QTensor, QTensor4
    from ..models.lora import LoRAWeight
    tp = mesh.shape["tp"]

    def decide(joined: str, shape: tuple) -> str | None:
        """Column/row/None from the param name + logical shape."""
        if len(shape) < 2:
            return None
        last, second = shape[-1], shape[-2]
        col = last % tp == 0
        row = second % tp == 0
        if "attn" in joined and joined.endswith("in_proj"):
            return "col" if col else None
        if "attn" in joined and joined.endswith("out_proj"):
            return "row" if row else None
        if joined.endswith("mlp/linear_in") or "linear1" in joined:
            return "col" if col else None
        if joined.endswith("mlp/linear_out") or "linear2" in joined:
            return "row" if row else None
        if "emb" in joined and joined.endswith("weight"):
            # Embedding TABLES (accessed by vocab gather) stay tp-replicated:
            # a tp-sharded embedding dim makes GSPMD fully rematerialize the
            # gather (and its scatter-add transpose in the backward) every
            # step ("Involuntary full rematerialization", XLA b/433785288).
            # They are ~0.5 GB total at 7B — cheap next to per-step vocab
            # collectives; FSDP still shards them over dp (fsdp_param_spec
            # adds the dp axis on the vocab dim, which gathers cleanly).
            return None
        if "emb" in joined or "text_linear" in joined or "linears" in joined:
            return "col" if col else None
        return None

    def col_spec(ndim):  # shard the last axis
        return P(*(None,) * (ndim - 1), "tp")

    def row_spec(ndim, axis_from_end=2):  # shard `axis_from_end` from the end
        return P(*(None,) * (ndim - axis_from_end), "tp",
                 *(None,) * (axis_from_end - 1))

    def expand(kind: str | None, x):
        """Per-child specs for a (possibly wrapped) weight leaf."""
        if isinstance(x, LoRAWeight):
            # a: [.., din, rank] follows the row sharding (its din contracts
            # against the row-sharded input); b: [.., rank, dout] follows the
            # column sharding.  The other adapter half stays replicated (rank
            # is tiny).
            a_spec = row_spec(x.a.ndim) if kind == "row" and x.a.shape[-2] % tp == 0 else P()
            b_spec = col_spec(x.b.ndim) if kind == "col" and x.b.shape[-1] % tp == 0 else P()
            return LoRAWeight(expand(kind, x.base), a_spec, b_spec, x.scaling)
        if isinstance(x, QTensor):
            # q: [.., in, out]; scale: [.., 1, out]
            if kind == "col":
                return QTensor(col_spec(x.q.ndim), col_spec(x.scale.ndim))
            if kind == "row":
                return QTensor(row_spec(x.q.ndim), P())  # scale din-axis is 1
            return QTensor(P(), P())
        if isinstance(x, QTensor4):
            # q: [.., in/2, out]; scale: [.., in/gs, 1, out]
            if kind == "col":
                return QTensor4(col_spec(x.q.ndim), col_spec(x.scale.ndim))
            if kind == "row" and x.q.shape[-2] % tp == 0 \
                    and x.scale.shape[-3] % tp == 0:
                return QTensor4(row_spec(x.q.ndim), row_spec(x.scale.ndim, 3))
            return QTensor4(P(), P())
        if kind == "col":
            return col_spec(x.ndim)
        if kind == "row":
            return row_spec(x.ndim)
        return P()

    def spec_for(path: tuple, x):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        if getattr(x, "ndim", 0) == 0:
            return P()
        return expand(decide(joined, tuple(x.shape)), x)

    return jax.tree_util.tree_map_with_path(
        spec_for, params,
        is_leaf=lambda x: isinstance(x, (QTensor, QTensor4, LoRAWeight)))


def _with_axis(spec: P, shape: tuple, n: int, name: str) -> P:
    """Add mesh axis `name` to `spec` on the largest still-unsharded,
    divisible dim of `shape` (no-op when none qualifies)."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    best = None
    for i, d in enumerate(shape):
        if parts[i] is None and d % n == 0 and d >= n \
                and (best is None or d > shape[best]):
            best = i
    if best is None:
        return spec
    parts[best] = name
    return P(*parts)


def fsdp_param_spec(tree, mesh: Mesh, axis: str = "dp", base=None):
    """ZeRO-3-style fully-sharded specs: each leaf's largest divisible dim is
    sharded over the `axis` mesh axis; GSPMD inserts the per-layer
    all-gathers in forward/backward and reduce-scatters the gradients — the
    FSDP the reference only hints at (`_fsdp_final` flags,
    moshi/moshi/modules/transformer.py:357, fsdp_best_state loaders.py:426).

    Purely shape-based, so applying it to the OPTIMIZER STATE tree yields
    shardings consistent with the parameters (mu/nu share param shapes;
    scalars stay replicated).  `base` optionally composes with an existing
    spec tree (e.g. `lm_param_spec`'s tensor-parallel specs): the fsdp axis
    goes on the largest dim the base left unsharded."""
    n = mesh.shape[axis]

    def leaf(x, b=P()):
        shape = tuple(getattr(x, "shape", ()))
        if not shape:
            return P()
        return _with_axis(b, shape, n, axis)

    if base is None:
        return jax.tree.map(leaf, tree)
    return jax.tree.map(leaf, tree, base)


def opt_state_spec(opt_state, params, param_specs, mesh: Mesh | None = None,
                   axis: str = "dp"):
    """Spec tree for an optax state, derived from the PARAM specs: any
    subtree structured exactly like `params` (adamw's mu/nu) gets the param
    spec tree verbatim.  Sharding mu/nu identically to the params is what
    makes the optimizer update local under ZeRO-3 — independently-derived
    specs (e.g. shape-based fsdp specs without the tensor-parallel base)
    force GSPMD to reshard the whole adamw state every step.

    Leaves outside params-structured subtrees (step counts; masked states
    from optax.multi_transform) get the shape-based fsdp rule when `mesh` is
    given, else stay replicated."""
    params_treedef = jax.tree.structure(params)

    def fallback(x):
        shape = tuple(getattr(x, "shape", ()))
        if mesh is None or not shape:
            return P()
        return _with_axis(P(), shape, mesh.shape[axis], axis)

    def rec(node):
        try:
            if jax.tree.structure(node) == params_treedef:
                return param_specs
        except Exception:
            pass
        if isinstance(node, tuple):  # incl. optax NamedTuple states
            children = [rec(c) for c in node]
            return type(node)(*children) if hasattr(node, "_fields") \
                else tuple(children)
        if isinstance(node, list):
            return [rec(c) for c in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return fallback(node)

    return rec(opt_state)


def shard_tree(tree, mesh: Mesh, specs):
    """Device-put every leaf of `tree` onto `mesh` per the matching spec
    tree (wrapped leaves like QTensor descend structurally)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def shard_params(params, mesh: Mesh):
    """Device-put params according to `lm_param_spec`."""
    specs = lm_param_spec(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_spec(mesh: Mesh) -> P:
    return P("dp")


def host_staged_loading():
    """Context manager for checkpoint loads that will be sharded onto a
    mesh: stages arrays in host memory so the full weights never pile onto
    one chip before the sharded device_put (a bf16 7B ~15 GB OOMs a single
    16 GB chip otherwise).  No-op when no CPU backend exists."""
    import contextlib
    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()
