"""Native checkpoint save/load for moshi_tpu param trees (safetensors).

The reference ships importers/exporters between research ckpts and its three
backends (`scripts/import_*.py`, `export_quantized.py`); this is the
equivalent for the JAX tree format, including int8/int4 QTensor leaves.
Trees are flattened with '/'-joined key paths; QTensor leaves are stored as
`<path>#q` / `<path>#scale` pairs (`#q4`/`#scale4` for 4-bit), list lengths
as `<path>#len`, and empty dict/list nodes as `<path>#empty` sentinels (Mimi
trees contain empty `output_projs` entries when no projection is needed).
"""

from pathlib import Path

import jax
import jax.numpy as jnp

from ..utils.quantize import QTensor, QTensor4


def _flatten(tree, prefix=""):
    from .lora import LoRAWeight
    out = {}
    if isinstance(tree, QTensor):
        out[prefix + "#q"] = tree.q
        out[prefix + "#scale"] = tree.scale
    elif isinstance(tree, QTensor4):
        out[prefix + "#q4"] = tree.q
        out[prefix + "#scale4"] = tree.scale
    elif isinstance(tree, LoRAWeight):
        # stored as a nested marker dict so the (possibly quantized) base
        # reuses the QTensor encoding
        out.update(_flatten(
            {"__lora__": {"base": tree.base, "a": tree.a, "b": tree.b,
                          "scaling": jnp.asarray(tree.scaling, jnp.float32)}},
            prefix))
    elif isinstance(tree, dict):
        if not tree and prefix:
            out[prefix + "#empty"] = jnp.asarray(0, jnp.int32)
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else k))
    elif isinstance(tree, (list, tuple)):
        out[prefix + "#len"] = jnp.asarray(len(tree), jnp.int32)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}/{i}"))
    else:
        out[prefix] = tree
    return out


def flatten_tree(tree: dict) -> dict:
    """Public: tree (incl. QTensor/QTensor4/LoRAWeight leaves) -> flat
    {'/'-joined path: array} dict, the on-disk/wire encoding."""
    return _flatten(tree)


def save_params(path: str | Path, params: dict):
    from safetensors.flax import save_file
    flat = _flatten(params)
    save_file({k: jnp.asarray(v) for k, v in flat.items()}, str(path))


def load_params(path: str | Path) -> dict:
    from .loaders import load_safetensors
    return unflatten_tree(load_safetensors(path))


def unflatten_tree(flat: dict) -> dict:
    """Public inverse of flatten_tree."""
    root: dict = {}
    lists: dict = {}
    qts: dict = {}
    for key, value in flat.items():
        if "#" in key:
            base, field = key.rsplit("#", 1)
            if field == "len":
                lists[base] = int(value)
            elif field == "empty":
                _insert(root, base.split("/"), {})
            else:
                qts.setdefault(base, {})[field] = value
            continue
        _insert(root, key.split("/"), value)
    for base, parts in qts.items():
        if "q4" in parts:
            if parts["q4"].ndim == parts["scale4"].ndim:
                # legacy two-plane packing (pre sequential-pair format)
                from ..utils.quantize import repack_legacy_q4
                leaf = repack_legacy_q4(parts["q4"], parts["scale4"])
            else:
                leaf = QTensor4(parts["q4"], parts["scale4"])
        else:
            leaf = QTensor(parts["q"], parts["scale"])
        _insert(root, base.split("/"), leaf)
    for base in sorted(lists, key=len, reverse=True):
        node, last = _walk(root, base.split("/"))
        d = node.get(last, {})
        node[last] = [d[str(i)] for i in range(lists[base])]
    return _rebuild_lora(root)


def _rebuild_lora(tree):
    from .lora import LoRAWeight
    if isinstance(tree, dict):
        if set(tree) == {"__lora__"}:
            lw = tree["__lora__"]
            return LoRAWeight(_rebuild_lora(lw["base"]), lw["a"], lw["b"],
                              float(lw["scaling"]))
        return {k: _rebuild_lora(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_rebuild_lora(v) for v in tree]
    return tree


def _insert(root, parts, value):
    node = root
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _walk(root, parts):
    node = root
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    return node, parts[-1]
