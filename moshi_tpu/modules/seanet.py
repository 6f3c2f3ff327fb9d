"""SEANet streaming encoder/decoder.

Behavioral reference: `moshi/moshi/modules/seanet.py` — encoder (96-239):
init conv (K=7) -> per downsampling ratio [n_residual x ResnetBlock(K=3,
dilation base**j) + ELU + stride conv K=2*ratio], channels doubling each
stage -> ELU + final conv to `dimension`; ratios are reversed for the encoder
(seanet.py:154).  Decoder (242-392) mirrors with transposed convs.
ResnetBlock (20-93): ELU+conv bottleneck (dim/compress) then ELU+conv 1x1
back, true-skip identity residual.

Everything is built from the streaming convs in `conv.py`; parameters/state
are nested lists aligned with a static item plan so that offline `apply` and
streaming `step` share one code path.
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from .conv import StreamingConv1d, StreamingConvTranspose1d


@dataclass(frozen=True)
class SEANetConfig:
    channels: int = 1
    dimension: int = 512
    n_filters: int = 64
    n_residual_layers: int = 1
    ratios: tuple[int, ...] = (8, 6, 5, 4)
    kernel_size: int = 7
    residual_kernel_size: int = 3
    last_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    pad_mode: str = "constant"
    true_skip: bool = True
    # "ELU" with alpha=1.0 is the only activation used by Mimi.
    activation: str = "elu"

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.ratios:
            h *= r
        return h


def _act(name: str, x: jax.Array) -> jax.Array:
    if name == "elu":
        return jax.nn.elu(x)
    raise ValueError(f"unsupported activation {name}")


@dataclass(frozen=True)
class _ResBlock:
    """SEANetResnetBlock: each conv preceded by the activation; identity skip."""
    convs: tuple[StreamingConv1d, ...]
    shortcut: StreamingConv1d | None  # None == true skip

    def init_params(self, key, dtype):
        keys = jax.random.split(key, len(self.convs) + 1)
        p = {"block": [c.init_params(k, dtype) for c, k in zip(self.convs, keys)]}
        if self.shortcut is not None:
            p["shortcut"] = self.shortcut.init_params(keys[-1], dtype)
        return p

    def init_state(self, B, dtype):
        s = {"block": [c.init_state(B, dtype) for c in self.convs]}
        if self.shortcut is not None:
            s["shortcut"] = self.shortcut.init_state(B, dtype)
        return s

    def apply(self, params, x, activation):
        y = x
        for c, p in zip(self.convs, params["block"]):
            y = _act(activation, y)
            y = c.apply(p, y)
        if self.shortcut is not None:
            x = self.shortcut.apply(params["shortcut"], x)
        return x + y

    def step(self, params, state, x, activation, exec_mask=None):
        y = x
        new_block = []
        for c, p, s in zip(self.convs, params["block"], state["block"]):
            y = _act(activation, y)
            y, s = c.step(p, s, y, exec_mask)
            new_block.append(s)
        new_state = {"block": new_block}
        if self.shortcut is not None:
            x, sc = self.shortcut.step(params["shortcut"], state["shortcut"], x, exec_mask)
            new_state["shortcut"] = sc
        return x + y, new_state


def _make_resblock(cfg: SEANetConfig, dim: int, dilation: int) -> _ResBlock:
    hidden = dim // cfg.compress
    kernel_sizes = (cfg.residual_kernel_size, 1)
    dilations = (dilation, 1)
    convs = []
    for i, (ks, dil) in enumerate(zip(kernel_sizes, dilations)):
        in_chs = dim if i == 0 else hidden
        out_chs = dim if i == len(kernel_sizes) - 1 else hidden
        convs.append(StreamingConv1d(in_chs, out_chs, ks, dilation=dil,
                                     pad_mode=cfg.pad_mode))
    shortcut = None if cfg.true_skip else StreamingConv1d(dim, dim, 1, pad_mode=cfg.pad_mode)
    return _ResBlock(tuple(convs), shortcut)


class _SEANetBase:
    """Shared plan-walking logic.  `self.items` is a list of
    (kind, module, pre_act) where kind in {conv, convtr, block}."""

    config: SEANetConfig
    items: list

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        keys = jax.random.split(key, len(self.items))
        out = []
        for (kind, mod, _), k in zip(self.items, keys):
            out.append(mod.init_params(k, dtype))
        return {"model": out}

    def init_state(self, batch_size: int, dtype=jnp.float32) -> dict:
        return {"model": [mod.init_state(batch_size, dtype) for _, mod, _ in self.items]}

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        a = self.config.activation
        for (kind, mod, pre_act), p in zip(self.items, params["model"]):
            if kind == "block":
                x = mod.apply(p, x, a)
            else:
                if pre_act:
                    x = _act(a, x)
                x = mod.apply(p, x)
        return x

    def step(self, params: dict, state: dict, x: jax.Array,
             exec_mask: jax.Array | None = None) -> tuple[jax.Array, dict]:
        a = self.config.activation
        new_states = []
        for (kind, mod, pre_act), p, s in zip(self.items, params["model"], state["model"]):
            if kind == "block":
                x, s = mod.step(p, s, x, a, exec_mask)
            else:
                if pre_act:
                    x = _act(a, x)
                x, s = mod.step(p, s, x, exec_mask)
            new_states.append(s)
        return x, {"model": new_states}


class SEANetEncoder(_SEANetBase):
    """24 kHz mono [B, T, 1] -> 50 Hz latent [B, T/hop, dimension]."""

    def __init__(self, config: SEANetConfig):
        self.config = config
        cfg = config
        ratios = tuple(reversed(cfg.ratios))
        mult = 1
        # torch_indices mirror the reference nn.Sequential numbering, where
        # activations occupy their own slots (seanet.py:169-236).
        items: list = [("conv", StreamingConv1d(cfg.channels, mult * cfg.n_filters,
                                                cfg.kernel_size, pad_mode=cfg.pad_mode), False)]
        tidx = [0]
        i = 1
        for ratio in ratios:
            for j in range(cfg.n_residual_layers):
                items.append(("block", _make_resblock(cfg, mult * cfg.n_filters,
                                                      cfg.dilation_base ** j), False))
                tidx.append(i)
                i += 1
            i += 1  # activation slot
            items.append(("conv", StreamingConv1d(mult * cfg.n_filters,
                                                  mult * cfg.n_filters * 2,
                                                  ratio * 2, stride=ratio,
                                                  pad_mode=cfg.pad_mode), True))
            tidx.append(i)
            i += 1
            mult *= 2
        i += 1  # final activation slot
        items.append(("conv", StreamingConv1d(mult * cfg.n_filters, cfg.dimension,
                                              cfg.last_kernel_size, pad_mode=cfg.pad_mode), True))
        tidx.append(i)
        self.items = items
        self.torch_indices = tidx


class SEANetDecoder(_SEANetBase):
    """50 Hz latent [B, T, dimension] -> 24 kHz mono [B, T*hop, 1]."""

    def __init__(self, config: SEANetConfig):
        self.config = config
        cfg = config
        mult = int(2 ** len(cfg.ratios))
        items: list = [("conv", StreamingConv1d(cfg.dimension, mult * cfg.n_filters,
                                                cfg.kernel_size, pad_mode=cfg.pad_mode), False)]
        tidx = [0]
        i = 1
        for ratio in cfg.ratios:
            i += 1  # activation slot
            items.append(("convtr", StreamingConvTranspose1d(mult * cfg.n_filters,
                                                             mult * cfg.n_filters // 2,
                                                             ratio * 2, stride=ratio), True))
            tidx.append(i)
            i += 1
            for j in range(cfg.n_residual_layers):
                items.append(("block", _make_resblock(cfg, mult * cfg.n_filters // 2,
                                                      cfg.dilation_base ** j), False))
                tidx.append(i)
                i += 1
            mult //= 2
        i += 1  # final activation slot
        items.append(("conv", StreamingConv1d(cfg.n_filters, cfg.channels,
                                              cfg.last_kernel_size, pad_mode=cfg.pad_mode), True))
        tidx.append(i)
        self.items = items
        self.torch_indices = tidx
