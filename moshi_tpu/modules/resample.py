"""Learnt strided resampling between the 50 Hz encoder rate and the 12.5 Hz
token rate.

Behavioral reference: `moshi/moshi/modules/resample.py` — `ConvDownsample1d`
(14-65): stride-S causal conv with K=2S, replicate padding, no bias;
`ConvTrUpsample1d` (68-119): stride-S transposed conv with K=2S; when not
learnt the output is normalised by the convtr of ones (109-119).  Mimi uses
learnt=True with channel_wise=True for the upsample (the
`upsample_channel_wise_bug` compat flag, models/compression.py:121-122 & 216).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .conv import StreamingConv1d, StreamingConvTranspose1d


@dataclass(frozen=True)
class ConvDownsample1d:
    stride: int
    dimension: int
    learnt: bool = True
    channel_wise: bool = False

    def __post_init__(self):
        conv_dim = self.dimension if self.learnt else 1
        groups = self.dimension if (self.learnt and self.channel_wise) else 1
        object.__setattr__(self, "conv", StreamingConv1d(
            conv_dim, conv_dim, kernel_size=2 * self.stride, stride=self.stride,
            groups=groups, bias=False, pad_mode="replicate"))

    def init_params(self, key, dtype=jnp.float32):
        if self.learnt:
            return self.conv.init_params(key, dtype)
        w = jnp.full((2 * self.stride, 1, 1), 1.0 / (2 * self.stride), dtype)
        return {"weight": w}

    def init_state(self, batch_size, dtype=jnp.float32):
        B = batch_size if self.learnt else batch_size * self.dimension
        return self.conv.init_state(B, dtype)

    def _reshape_in(self, x):
        if self.learnt:
            return x
        B, T, C = x.shape
        return x.transpose(0, 2, 1).reshape(B * C, T, 1)

    def _reshape_out(self, y, B):
        if self.learnt:
            return y
        BC, T, _ = y.shape
        return y.reshape(B, BC // B, T).transpose(0, 2, 1)

    def apply(self, params, x):
        B = x.shape[0]
        return self._reshape_out(self.conv.apply(params, self._reshape_in(x)), B)

    def step(self, params, state, x, exec_mask=None):
        B = x.shape[0]
        if not self.learnt and exec_mask is not None:
            exec_mask = jnp.repeat(exec_mask, self.dimension)
        y, state = self.conv.step(params, state, self._reshape_in(x), exec_mask)
        return self._reshape_out(y, B), state


@dataclass(frozen=True)
class ConvTrUpsample1d:
    stride: int
    dimension: int
    learnt: bool = True
    channel_wise: bool = False

    def __post_init__(self):
        conv_dim = self.dimension if self.learnt else 1
        groups = self.dimension if (self.learnt and self.channel_wise) else 1
        object.__setattr__(self, "convtr", StreamingConvTranspose1d(
            conv_dim, conv_dim, kernel_size=2 * self.stride, stride=self.stride,
            groups=groups, bias=False))

    def init_params(self, key, dtype=jnp.float32):
        if self.learnt:
            return self.convtr.init_params(key, dtype)
        return {"weight": jnp.ones((2 * self.stride, 1, 1), dtype)}

    def init_state(self, batch_size, dtype=jnp.float32):
        if self.learnt:
            return self.convtr.init_state(batch_size, dtype)
        B = batch_size * self.dimension
        # The non-learnt path normalizes by the position-dependent convtr-of-
        # ones response (resample.py:109-119); stream that response through a
        # parallel convtr state so early windows match the offline apply().
        return {"conv": self.convtr.init_state(B, dtype),
                "norm": self.convtr.init_state(B, dtype)}

    def apply(self, params, x):
        B = x.shape[0]
        if self.learnt:
            return self.convtr.apply(params, x)
        Bc, T, C = x.shape
        xr = x.transpose(0, 2, 1).reshape(B * C, T, 1)
        y = self.convtr.apply(params, xr)
        ones = jnp.ones_like(xr[:1])
        norm = self.convtr.apply(params, ones)
        y = y / norm
        return y.reshape(B, C, -1).transpose(0, 2, 1)

    def step(self, params, state, x, exec_mask=None):
        if self.learnt:
            return self.convtr.step(params, state, x, exec_mask)
        B, T, C = x.shape
        xr = x.transpose(0, 2, 1).reshape(B * C, T, 1)
        if exec_mask is not None:
            exec_mask = jnp.repeat(exec_mask, C)
        y, conv_state = self.convtr.step(params, state["conv"], xr, exec_mask)
        norm, norm_state = self.convtr.step(params, state["norm"],
                                            jnp.ones_like(xr), exec_mask)
        y = y / norm
        state = {"conv": conv_state, "norm": norm_state}
        return y.reshape(B, C, -1).transpose(0, 2, 1), state
