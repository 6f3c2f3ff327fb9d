"""Native checkpoint save/load for moshi_tpu param trees (safetensors).

The reference ships importers/exporters between research ckpts and its three
backends (`scripts/import_*.py`, `export_quantized.py`); this is the
equivalent for the JAX tree format, including int8 QTensor leaves.  Trees are
flattened with '/'-joined key paths; QTensor leaves are stored as
`<path>#q` / `<path>#scale` pairs.
"""

from pathlib import Path

import jax
import jax.numpy as jnp

from ..utils.quantize import QTensor


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, QTensor):
        out[prefix + "#q"] = tree.q
        out[prefix + "#scale"] = tree.scale
    elif isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else k))
    elif isinstance(tree, (list, tuple)):
        out[prefix + "#len"] = jnp.asarray(len(tree), jnp.int32)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}/{i}"))
    else:
        out[prefix] = tree
    return out


def save_params(path: str | Path, params: dict):
    from safetensors.flax import save_file
    flat = _flatten(params)
    save_file({k: jnp.asarray(v) for k, v in flat.items()}, str(path))


def load_params(path: str | Path) -> dict:
    from .loaders import load_safetensors
    flat = load_safetensors(path)

    root: dict = {}
    lists: set = set()
    qts: dict = {}
    for key, value in flat.items():
        if key.endswith("#len"):
            lists.add(key[:-4])
            continue
        if key.endswith("#q") or key.endswith("#scale"):
            base, field = key.rsplit("#", 1)
            qts.setdefault(base, {})[field] = value
            continue
        _insert(root, key.split("/"), value)
    for base, parts in qts.items():
        _insert(root, base.split("/"), QTensor(parts["q"], parts["scale"]))
    for base in sorted(lists, key=len, reverse=True):
        node, last = _walk(root, base.split("/"))
        d = node[last]
        node[last] = [d[str(i)] for i in range(len(d))]
    return root


def _insert(root, parts, value):
    node = root
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _walk(root, parts):
    node = root
    for p in parts[:-1]:
        node = node[p]
    return node, parts[-1]
