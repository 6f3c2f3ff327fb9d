"""Conditioners: text LUT / tensor conditions -> sum or cross-attention inputs.

Behavioral reference: `moshi/moshi/conditioners/` —
- `BaseConditioner` (base.py:93-165): output projection (no bias) + learnt
  padding vector blended where the mask is invalid;
- `LUTConditioner`/`NoopTokenizer` (text.py:63-134): whole-string hash or
  enum lookup, pad index = n_bins;
- `TensorConditioner` (tensors.py:7-16): pass-through (used for TTS speaker
  cross-attention embeddings);
- `ConditionProvider.prepare_and_provide` (base.py:343-346) and
  `ConditionFuser.get_sum`/`get_cross` (base.py:392-421);
- `dropout_all_conditions` (base.py:210-222) builds the CFG null condition.

Tokenization/hashing happens on host (strings), embedding math in JAX.
"""

import hashlib
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .utils.matmul import dot


@dataclass
class TensorCondition:
    """tensor: [B|1, T, D]; mask: [B|1, T]."""
    tensor: np.ndarray
    mask: np.ndarray

    @staticmethod
    def from_tensor(tensor):
        B, T, _ = tensor.shape
        return TensorCondition(tensor, np.ones((B, T), bool))

    @staticmethod
    def cat(conditions):
        ref = conditions[0].tensor
        B = len(conditions)
        T = max(c.tensor.shape[1] for c in conditions)
        D = ref.shape[-1]
        tensor = np.zeros((B, T, D), np.asarray(ref).dtype)
        mask = np.zeros((B, T), bool)
        for b, c in enumerate(conditions):
            tensor[b, :c.tensor.shape[1]] = np.asarray(c.tensor)[0]
            mask[b, :c.mask.shape[1]] = np.asarray(c.mask)[0]
        return TensorCondition(tensor, mask)


@dataclass
class ConditionAttributes:
    text: dict = field(default_factory=dict)     # name -> str | None
    tensor: dict = field(default_factory=dict)   # name -> TensorCondition

    def copy(self):
        return ConditionAttributes(dict(self.text), dict(self.tensor))


def dropout_all_conditions(attributes):
    """Null-condition variant for CFG (base.py:210-222)."""
    out = []
    for a in attributes:
        a = a.copy()
        a.text = {k: None for k in a.text}
        a.tensor = {k: TensorCondition(np.zeros_like(v.tensor),
                                       np.zeros_like(v.mask))
                    for k, v in a.tensor.items()}
        out.append(a)
    return out


def hash_trick(word: str, vocab_size: int) -> int:
    h = int(hashlib.sha256(word.encode("utf-8")).hexdigest(), 16)
    return h % vocab_size


class LUTConditioner:
    """Params: {"embed": [n_bins+1, dim], "output_proj": [dim, output_dim],
    "learnt_padding": [1, 1, output_dim]}."""

    kind = "text"

    def __init__(self, output_dim: int, n_bins: int, dim: int, tokenizer: str = "noop",
                 possible_values: list[str] | None = None, init_scale: float = 1.0):
        assert tokenizer == "noop", tokenizer
        self.n_bins = n_bins
        self.dim = dim
        self.output_dim = output_dim
        self.init_scale = init_scale
        self.pad_idx = n_bins
        self.possible_values = None
        if possible_values is not None:
            self.possible_values = {v: i for i, v in enumerate(possible_values)}

    def init_params(self, key, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "embed": jax.random.normal(k1, (self.n_bins + 1, self.dim), dtype) * self.init_scale,
            "output_proj": jax.random.normal(k2, (self.dim, self.output_dim), dtype)
            / jnp.sqrt(self.dim).astype(dtype),
            "learnt_padding": jax.random.normal(k3, (1, 1, self.output_dim), dtype) * 0.2,
        }

    def prepare(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        tokens, lengths = [], []
        for t in texts:
            if t is None:
                tokens.append(self.pad_idx)
                lengths.append(0)
            elif self.possible_values is not None:
                if t not in self.possible_values:
                    raise ValueError(f"{t!r} not in possible_values")
                tokens.append(self.possible_values[t])
                lengths.append(1)
            else:
                tokens.append(hash_trick(t, self.n_bins))
                lengths.append(1)
        tokens = np.asarray(tokens, np.int32)[:, None]
        mask = np.arange(1)[None, :] < np.asarray(lengths)[:, None]
        return tokens, mask

    def apply(self, params, prepared):
        tokens, mask = prepared
        emb = jnp.take(params["embed"], jnp.asarray(tokens), axis=0)
        cond = dot(emb, params["output_proj"])
        maskf = jnp.asarray(mask, jnp.float32)[..., None]
        cond = cond * maskf + params["learnt_padding"] * (1 - maskf)
        return cond, jnp.asarray(mask)


class ContinuousAttributeConditioner:
    """Sinusoidal embedding of a continuous scalar value, projected and added
    to the input (rust/moshi-core/src/conditioner.rs `ContinuousAttribute`,
    62-120: value * scale_factor -> sin/cos embedding -> output_proj)."""

    kind = "text"  # values arrive as strings, e.g. "2.5"

    def __init__(self, output_dim: int, dim: int, scale_factor: float,
                 max_period: float = 10_000.0):
        self.output_dim = output_dim
        self.dim = dim
        self.scale_factor = scale_factor
        self.max_period = max_period

    def init_params(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return {
            "output_proj": jax.random.normal(k1, (self.dim, self.output_dim), dtype)
            / jnp.sqrt(self.dim).astype(dtype),
            "learnt_padding": jax.random.normal(k2, (1, 1, self.output_dim), dtype) * 0.2,
        }

    def prepare(self, values: list):
        vals = np.asarray([[0.0 if v is None else float(v)] for v in values],
                          np.float32)[:, :, None]  # [B, 1, 1]
        mask = np.asarray([[v is not None] for v in values], bool)
        return vals, mask

    def apply(self, params, prepared):
        vals, mask = prepared
        half = self.dim // 2
        positions = jnp.asarray(vals) * self.scale_factor
        adim = (1.0 / self.max_period ** (jnp.arange(half, dtype=jnp.float32)
                                          / (half - 1))).reshape(1, 1, -1)
        freqs = positions * adim
        emb = jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)
        cond = dot(emb, params["output_proj"])
        maskf = jnp.asarray(mask, jnp.float32)[..., None]
        cond = cond * maskf + params["learnt_padding"] * (1 - maskf)
        return cond, jnp.asarray(mask)


class TensorConditioner:
    """Pass-through tensor conditioner with output projection + learnt padding."""

    kind = "tensor"

    def __init__(self, output_dim: int, dim: int):
        self.dim = dim
        self.output_dim = output_dim

    def init_params(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return {
            "output_proj": jax.random.normal(k1, (self.dim, self.output_dim), dtype)
            / jnp.sqrt(self.dim).astype(dtype),
            "learnt_padding": jax.random.normal(k2, (1, 1, self.output_dim), dtype) * 0.2,
        }

    def prepare(self, cond: TensorCondition):
        return np.asarray(cond.tensor), np.asarray(cond.mask)

    def apply(self, params, prepared):
        tensor, mask = prepared
        cond = dot(jnp.asarray(tensor), params["output_proj"])
        maskf = jnp.asarray(mask, jnp.float32)[..., None]
        cond = cond * maskf + params["learnt_padding"] * (1 - maskf)
        return cond, jnp.asarray(mask)


class ConditionProvider:
    def __init__(self, conditioners: dict):
        self.conditioners = conditioners

    def init_params(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, max(len(self.conditioners), 1))
        return {name: c.init_params(k, dtype)
                for (name, c), k in zip(self.conditioners.items(), keys)}

    def prepare(self, attributes: list) -> dict:
        prepared = {}
        for name, cond in self.conditioners.items():
            if cond.kind == "text":
                prepared[name] = cond.prepare([a.text[name] for a in attributes])
            else:
                prepared[name] = cond.prepare(
                    TensorCondition.cat([a.tensor[name] for a in attributes]))
        return prepared

    def apply(self, params: dict, prepared: dict) -> dict:
        return {name: self.conditioners[name].apply(params[name], p)
                for name, p in prepared.items()}

    def prepare_and_provide(self, params, attributes):
        return self.apply(params, self.prepare(attributes))


class ConditionFuser:
    """sum / cross fusing of named conditions (base.py:349-436)."""

    def __init__(self, fuse2cond: dict):
        self.fuse2cond = {k: list(v) for k, v in fuse2cond.items()}
        for method in ("sum", "cross", "prepend"):
            self.fuse2cond.setdefault(method, [])
        assert not self.fuse2cond["prepend"], "prepend fusing not supported (unused by released models)"

    @property
    def has_conditions(self) -> bool:
        return bool(self.fuse2cond["sum"] or self.fuse2cond["cross"])

    def get_sum(self, condition_tensors: dict):
        total = None
        for name in self.fuse2cond["sum"]:
            cond, _ = condition_tensors[name]
            assert cond.shape[1] == 1, cond.shape
            total = cond if total is None else total + cond
        return total

    def get_cross(self, condition_tensors: dict):
        cross = None
        for name in self.fuse2cond["cross"]:
            cond, _ = condition_tensors[name]
            cross = cond if cross is None else jnp.concatenate([cross, cond], axis=1)
        return cross


def conditioners_from_config(output_dim: int, cfg: dict) -> ConditionProvider:
    """Build from the `conditioners` block of config.json (reference
    loaders.py:449-473)."""
    conds = {}
    for name, ccfg in cfg.items():
        ctype = ccfg["type"]
        kwargs = dict(ccfg[ctype])
        if ctype == "lut":
            conds[name] = LUTConditioner(output_dim=output_dim, **kwargs)
        elif ctype == "tensor":
            conds[name] = TensorConditioner(output_dim=output_dim, **kwargs)
        elif ctype in ("continuous_attribute", "ContinuousAttribute"):
            conds[name] = ContinuousAttributeConditioner(output_dim=output_dim,
                                                         **kwargs)
        else:
            raise ValueError(f"unknown conditioner type {ctype}")
    return ConditionProvider(conds)
