"""Streaming causal 1D convolutions for TPU.

Behavioral reference: `moshi/moshi/modules/conv.py` — `StreamingConv1d`
(lines 172-274) carries the last `K_eff - S` inputs across steps and supports
constant/replicate left padding with a `first`-step flag; and
`StreamingConvTranspose1d` (lines 289-362) carries a `K - S` overlap-add tail
with the bias subtracted from the carried part.

TPU-native design differences:
- layout is channels-last `[B, T, C]` (lanes = channels, feeds the MXU via
  `lax.conv_general_dilated` without transposes);
- state is an explicit pytree `{prev, first}` / `{partial}` threaded through a
  pure `step(params, state, x) -> (y, state)` so the whole codec step jits to
  a single XLA program (the reference relies on CUDA graphs for the same
  effect: `moshi/moshi/utils/compile.py:190-287`);
- per-slot freeze/reset uses an explicit `exec_mask` (`streaming.py:183-211`).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax


def conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
           stride: int = 1, dilation: int = 1, groups: int = 1) -> jax.Array:
    """VALID 1d convolution.  x: [B, T, Cin]; w: [K, Cin//groups, Cout]."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=lax.Precision.HIGHEST,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
                     stride: int = 1, groups: int = 1) -> jax.Array:
    """Full (untrimmed) 1d transposed convolution.

    x: [B, T, Cin]; w: [K, Cin//groups, Cout] stored *pre-flipped* so that the
    transpose is computed as a dilated convolution:
      y[n, co] = sum_{t, k : t*stride + k = n} x[t, ci] * w_torch[ci, co_rel, k]
    Output length is (T-1)*stride + K.
    """
    K = w.shape[0]
    y = lax.conv_general_dilated(
        x, jnp.flip(w, axis=0).astype(x.dtype),
        window_strides=(1,),
        padding=[(K - 1, K - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=lax.Precision.HIGHEST,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _mask2(exec_mask: jax.Array | None, B: int) -> jax.Array:
    if exec_mask is None:
        return jnp.ones((B, 1, 1), dtype=bool)
    return exec_mask.reshape(-1, 1, 1)


@dataclass(frozen=True)
class StreamingConv1d:
    """Causal streaming Conv1d.  Input steps must be a multiple of `stride`."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    pad_mode: str = "constant"  # constant | replicate

    def __post_init__(self):
        assert self.pad_mode in ("constant", "replicate"), self.pad_mode

    @property
    def effective_kernel_size(self) -> int:
        return (self.kernel_size - 1) * self.dilation + 1

    @property
    def state_len(self) -> int:
        return self.effective_kernel_size - self.stride

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        kw, kb = jax.random.split(key)
        fan_in = self.in_channels // self.groups * self.kernel_size
        scale = 1.0 / jnp.sqrt(fan_in)
        p = {
            "weight": jax.random.uniform(
                kw, (self.kernel_size, self.in_channels // self.groups, self.out_channels),
                dtype, -scale, scale)
        }
        if self.bias:
            p["bias"] = jax.random.uniform(kb, (self.out_channels,), dtype, -scale, scale)
        return p

    def init_state(self, batch_size: int, dtype=jnp.float32) -> dict:
        state = {}
        if self.state_len > 0:
            state["prev"] = jnp.zeros((batch_size, self.state_len, self.in_channels), dtype)
            if self.pad_mode == "replicate":
                state["first"] = jnp.ones((batch_size,), dtype=bool)
        return state

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        """Offline forward == streaming from a fresh state (causal left pad)."""
        if self.state_len > 0:
            mode = "edge" if self.pad_mode == "replicate" else "constant"
            x = jnp.pad(x, ((0, 0), (self.state_len, 0), (0, 0)), mode=mode)
        return conv1d(x, params["weight"], params.get("bias"),
                      stride=self.stride, dilation=self.dilation, groups=self.groups)

    def step(self, params: dict, state: dict, x: jax.Array,
             exec_mask: jax.Array | None = None) -> tuple[jax.Array, dict]:
        B, T, _ = x.shape
        assert T > 0 and T % self.stride == 0, "steps must be a positive multiple of stride"
        if self.state_len == 0:
            y = conv1d(x, params["weight"], params.get("bias"),
                       stride=self.stride, dilation=self.dilation, groups=self.groups)
            return y, state
        m = _mask2(exec_mask, B)
        prev = state["prev"]
        if self.pad_mode == "replicate":
            first = state["first"].reshape(-1, 1, 1)
            prev = jnp.where(first & m, x[:, :1].astype(prev.dtype), prev)
        full = jnp.concatenate([prev.astype(x.dtype), x], axis=1)
        y = conv1d(full, params["weight"], params.get("bias"),
                   stride=self.stride, dilation=self.dilation, groups=self.groups)
        new_state = dict(state)
        new_state["prev"] = jnp.where(m, full[:, -self.state_len:].astype(prev.dtype), state["prev"])
        if self.pad_mode == "replicate":
            new_state["first"] = jnp.where(
                exec_mask if exec_mask is not None else True,
                jnp.zeros_like(state["first"]), state["first"])
        return y, new_state


@dataclass(frozen=True)
class StreamingConvTranspose1d:
    """Causal streaming ConvTranspose1d with overlap-add carried state."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    bias: bool = True

    @property
    def state_len(self) -> int:
        return self.kernel_size - self.stride

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        kw, kb = jax.random.split(key)
        fan_in = self.in_channels // self.groups * self.kernel_size
        scale = 1.0 / jnp.sqrt(fan_in)
        p = {
            "weight": jax.random.uniform(
                kw, (self.kernel_size, self.in_channels // self.groups, self.out_channels),
                dtype, -scale, scale)
        }
        if self.bias:
            p["bias"] = jax.random.uniform(kb, (self.out_channels,), dtype, -scale, scale)
        return p

    def init_state(self, batch_size: int, dtype=jnp.float32) -> dict:
        if self.state_len == 0:
            return {}
        return {"partial": jnp.zeros((batch_size, self.state_len, self.out_channels), dtype)}

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        """Offline forward: emit T*stride outputs (right-trim of K - S)."""
        T = x.shape[1]
        y = conv_transpose1d(x, params["weight"], params.get("bias"),
                             stride=self.stride, groups=self.groups)
        return y[:, : T * self.stride]

    def step(self, params: dict, state: dict, x: jax.Array,
             exec_mask: jax.Array | None = None) -> tuple[jax.Array, dict]:
        B, T, _ = x.shape
        y = conv_transpose1d(x, params["weight"], params.get("bias"),
                             stride=self.stride, groups=self.groups)
        PT = self.state_len
        if PT == 0:
            return y, state
        partial = state["partial"]
        y = y.at[:, :PT].add(partial.astype(y.dtype))
        out = y[:, : T * self.stride]
        tail = y[:, T * self.stride:]
        if "bias" in params:
            tail = tail - params["bias"].astype(tail.dtype)
        m = _mask2(exec_mask, B)
        new_partial = jnp.where(m, tail.astype(partial.dtype), partial)
        return out, {"partial": new_partial}
