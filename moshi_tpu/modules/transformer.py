"""Streaming transformer with ring KV cache, TPU-native.

Behavioral reference: `moshi/moshi/modules/transformer.py` —
- `RingKVCache` (lines 196-288): fixed-capacity circular KV cache with
  scatter writes at `offset % capacity` and recomputed absolute positions
  (`positions = -1` marks never-written slots);
- `StreamingMultiheadAttention` (337-597): fused qkv in_proj, RoPE before
  caching, causal + sliding-window mask from position deltas
  (`delta = pos_q - pos_k`, valid iff `pos_k >= 0 and 0 <= delta < context`);
- `weights_per_step` (291-318): distinct projection/FFN weights per time step
  (used by the Depformer), with optional sharing schedule;
- `StreamingTransformer` (814-929) and `ProjectedTransformer` (932-983).

TPU-native design:
- all layer parameters are stacked on a leading `[num_layers, ...]` axis and
  the layer loop is a single `lax.scan` (one compiled layer body, fast
  compiles even at 32 layers);
- per-step weights are stacked on a `[num_weights, ...]` axis and selected
  with a (possibly traced) index vector, so the Depformer's 8 inner steps run
  inside one jitted program with no per-step recompilation;
- streaming state is an explicit pytree `{k, v, offset}` threaded through a
  pure `step`; per-slot freeze uses `exec_mask` like the reference's
  `respect_exec_mask` (transformer.py:243-288).
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from .norm import make_norm, LayerScale
from ..utils.matmul import dot, einsum, wdot
from ..utils.quantize import take0
from .rope import apply_rope


def create_sin_embedding(positions: jax.Array, dim: int,
                         max_period: float = 10_000.0) -> jax.Array:
    """Sinusoidal embedding [B, T, dim]; positions [B, T] (transformer.py:139-164)."""
    assert dim % 2 == 0
    half = dim // 2
    positions = positions.astype(jnp.float32)[..., None]
    adim = jnp.arange(half, dtype=jnp.float32).reshape(1, 1, -1)
    phase = positions / (max_period ** (adim / (half - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def gating_hidden_dim(dim: int, dim_feedforward: int) -> int:
    """Hidden width of the SiLU-gated FFN (moshi/moshi/modules/gating.py:50-58)."""
    if dim_feedforward == 4 * dim:
        return 21 * dim // 8
    return 2 * dim_feedforward // 3


def _per_step_linear(w: jax.Array, x: jax.Array,
                     idx: jax.Array | None) -> jax.Array:
    """Apply stacked per-step weights.  w: [W, din, dout]; x: [B, T, din];
    idx: [T] weight index per position (ignored when W == 1)."""
    if w.shape[0] == 1:
        return wdot(x, w[0])
    assert idx is not None, "weights_per_step requires step indices"
    if idx.shape[0] == 1:
        # single-step decode (depformer inner step): plain matmul so q4
        # weights route through the fused Pallas kernel
        return wdot(x, take0(w, idx)[0])
    wt = take0(w, idx).astype(x.dtype)  # [T, din, dout]
    return einsum("btd,tdo->bto", x, wt)


def _split_q4_layers(layers):
    """Split stacked layer params for a lax.scan: QTensor4 leaves leave the
    scan xs (scan's per-iteration dynamic-slice cannot fuse into a pallas
    operand — XLA copies the whole member, ~5 ms/frame on the 7B at B=1,
    measured) and are closure-captured whole; `rebuild(xs, l)` re-inserts
    them as QTensor4Ref views indexed by the layer id, which q4gemm_stacked
    consumes via scalar prefetch.

    Returns (xs_tree, rebuild).  Identity when there are no q4 leaves."""
    from ..utils.quantize import QTensor4, QTensor4Ref

    def is_q4(x):
        return isinstance(x, QTensor4)

    leaves, treedef = jax.tree.flatten(layers, is_leaf=is_q4)
    if not any(is_q4(x) for x in leaves):
        return layers, lambda xs, l: xs
    xs_leaves = [x for x in leaves if not is_q4(x)]

    def rebuild(xs_list, l):
        it = iter(xs_list)
        out = [QTensor4Ref.from_stack(x, l) if is_q4(x) else next(it)
               for x in leaves]
        return jax.tree.unflatten(treedef, out)

    return xs_leaves, rebuild


def ring_positions(offset: jax.Array, T: int, cap: int,
                   exec_mask: jax.Array | None) -> tuple[jax.Array, jax.Array]:
    """Absolute positions [B, cap] of ring slots after writing T new steps,
    with -1 for never-written slots, plus the updated offset [B]
    (RingKVCache.complete, transformer.py:255-288)."""
    idx = jnp.arange(cap, dtype=offset.dtype)[None]         # [1, cap]
    last = (offset + T - 1)[:, None]                        # [B, 1]
    end_index = last % cap
    delta = idx - end_index
    pos = jnp.where(delta <= 0, last + delta, last + delta - cap)
    if exec_mask is None:
        offset_next = offset + T
    else:
        offset_next = jnp.where(exec_mask, offset + T, offset)
    pos = jnp.where(idx >= offset_next[:, None], -1, pos)
    return pos, offset_next


@dataclass(frozen=True)
class TransformerConfig:
    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int = 2048
    causal: bool = True
    context: int | None = None
    positional_embedding: str = "rope"  # sin | rope | sin_rope | rope_concat | none
    max_period: float = 10_000.0
    positional_scale: float = 1.0
    gating: str = "none"  # none | silu | ...
    norm: str = "layer_norm"
    layer_scale: float | None = None
    kv_repeat: int = 1
    weights_per_step: int = 0
    weights_per_step_schedule: tuple[int, ...] | None = None
    cross_attention: bool = False
    # Cross-attention gating zoo (rust transformer.rs:96-186 `XaGate`):
    # normal | constant_gated_tanh | constant_gated_sigmoid |
    # conditional_gated_tanh | conditional_gated_sigmoid |
    # conditional_gated_tanh_learnable_bias | conditional_gated_sigmoid_learnable_bias
    cross_attention_gating: str = "normal"
    # Norm type in front of cross-attention (rust: per-model — RmsNorm for
    # vision, LayerNorm for TTS; the third tuple member of rust's
    # cross_attention config).
    cross_attention_norm: str = "layer_norm"
    # Input dim of the cross-attention source (None -> d_model); rust
    # transformer.rs:238-247 `kv_in_dim`.
    cross_attention_kv_dim: int | None = None
    # All layers share one set of cross-attn projections; gates stay
    # per-layer (rust transformer.rs:800, lm.rs vision presets).
    shared_cross_attn: bool = False
    # "int8" stores the ring KV cache quantized per (position, head) row,
    # halving KV HBM footprint and attention bandwidth (a TPU-native
    # extension; the reference keeps KV in model dtype).  "int4" packs two
    # CHANNELS per byte (channel-pair packing, positions along lanes):
    # quarter footprint, read by a fused Pallas flash-decode kernel
    # (ops/int4_attention.py) whose batched dots reinterpret packed blocks
    # as int4 via `pltpu.bitcast` — XLA alone cannot read nibble-packed KV
    # at speed (the s4 convert does not fuse; measured 75 GB/s vs 403 for
    # int8).  Unlocks B=16 at the full 4-minute context on one v5e.
    kv_cache_dtype: str = "model"  # model | int8 | int4
    # Layer-wise activation rematerialization for the offline/training
    # forward: each scan-layer's intermediates are recomputed in the
    # backward pass instead of stored (jax.checkpoint with the
    # dots-saveable policy keeps the matmul outputs — the classic
    # memory/FLOPs trade that fits 7B training activations in 16 GB HBM).
    remat: bool = False
    # With int8 KV, also quantize the query per row and compute the QK^T
    # scores as a native int8 x int8 MXU dot (int32 accumulate) instead of
    # dequantizing K to bf16 — removes the convert from the score matmul's
    # critical path.  PV keeps the bf16 convert (softmax weights quantize
    # poorly).
    attention_int8_qk: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def num_kv_heads(self) -> int:
        return self.num_heads // self.kv_repeat

    @property
    def num_weights(self) -> int:
        if not self.weights_per_step:
            return 1
        if self.weights_per_step_schedule is not None:
            assert len(self.weights_per_step_schedule) == self.weights_per_step
            return max(self.weights_per_step_schedule) + 1
        return self.weights_per_step

    @property
    def kv_capacity(self) -> int:
        """Ring cache capacity (transformer.py:466-479)."""
        if self.context is not None:
            return self.context
        if self.weights_per_step:
            return self.weights_per_step
        raise ValueError("cannot size a streaming KV cache without a context")

    @property
    def hidden(self) -> int:
        return gating_hidden_dim(self.d_model, self.dim_feedforward)

    @property
    def xa_kv_dim(self) -> int:
        return self.cross_attention_kv_dim or self.d_model

    @property
    def xa_gate_hidden(self) -> int:
        """Conditional-gate MLP hidden width (transformer.rs:141)."""
        return int(0.125 * self.d_model)

    def steps_to_weight_indices(self, steps: jax.Array) -> jax.Array | None:
        """Map absolute step indices [T] to weight indices via the schedule."""
        if self.num_weights == 1:
            return None
        if self.weights_per_step_schedule is not None:
            sched = jnp.asarray(self.weights_per_step_schedule, dtype=jnp.int32)
            return sched[steps]
        return steps


class StreamingTransformer:
    """Functional transformer; params/state are explicit pytrees."""

    def __init__(self, config: TransformerConfig):
        self.config = config
        c = config
        assert c.d_model % c.num_heads == 0
        assert c.num_heads % c.kv_repeat == 0
        self.rope = c.positional_embedding in ("rope", "sin_rope", "rope_concat")
        self.rope_interleave = c.positional_embedding != "rope_concat"
        self._norm1 = make_norm(c.norm, c.d_model)
        self._norm2 = make_norm(c.norm, c.d_model)
        self._norm_cross = make_norm(c.cross_attention_norm, c.d_model)
        self._ls = LayerScale(c.d_model, c.layer_scale) if c.layer_scale is not None else None

    # ------------------------------------------------------------------ params
    def init_params(self, key: jax.Array, dtype=jnp.bfloat16) -> dict:
        """Returns {"layers": <dict of arrays stacked on a [L, ...] axis>}
        plus, with shared_cross_attn, a single "cross_attn_shared" projection
        set outside the layer stack."""
        c = self.config
        p = {"layers": self._init_layer_params(key, dtype)}
        if c.cross_attention and c.shared_cross_attn:
            p["cross_attn_shared"] = self._init_xa_proj(
                jax.random.fold_in(key, 17), (), dtype)
        return p

    def _init_xa_proj(self, key: jax.Array, lead: tuple, dtype) -> dict:
        c = self.config
        d = c.d_model
        keys = jax.random.split(key, 3)

        def trunc(key, shape, fan_in):
            std = 1.0 / math.sqrt(fan_in)
            return (jax.random.truncated_normal(key, -3.0, 3.0, shape, jnp.float32) * std).astype(dtype)

        return {
            "q_proj": trunc(keys[0], lead + (d, d), d),
            "kv_proj": trunc(keys[1], lead + (c.xa_kv_dim, 2 * d), c.xa_kv_dim),
            "out_proj": trunc(keys[2], lead + (d, d), d),
        }

    def _init_xa_gate(self, key: jax.Array, lead: tuple, dtype) -> dict | None:
        c = self.config
        g = c.cross_attention_gating
        if g == "normal":
            return None
        if g.startswith("constant_gated"):
            return {"alpha": jnp.zeros(lead + (1, 1, 1), dtype)}
        h = c.xa_gate_hidden
        keys = jax.random.split(key, 2)

        def trunc(key, shape, fan_in):
            std = 1.0 / math.sqrt(fan_in)
            return (jax.random.truncated_normal(key, -3.0, 3.0, shape, jnp.float32) * std).astype(dtype)

        p = {"in_proj": trunc(keys[0], lead + (c.d_model, h), c.d_model),
             "out_proj": trunc(keys[1], lead + (h, c.d_model), h)}
        if g.endswith("learnable_bias"):
            p["bias"] = jnp.zeros(lead + (c.d_model,), dtype)
        return p

    def _init_layer_params(self, key: jax.Array, dtype=jnp.bfloat16) -> dict:
        c = self.config
        L, W, d = c.num_layers, c.num_weights, c.d_model
        kv_dim = c.head_dim * c.num_kv_heads
        qkv_out = d + 2 * kv_dim
        keys = jax.random.split(key, 8)

        def trunc(key, shape, fan_in):
            std = 1.0 / math.sqrt(fan_in)
            return (jax.random.truncated_normal(key, -3.0, 3.0, shape, jnp.float32) * std).astype(dtype)

        p = {
            "attn": {
                "in_proj": trunc(keys[0], (L, W, d, qkv_out), d),
                "out_proj": trunc(keys[1], (L, W, d, d), d),
            },
            "norm1": _stack_norm_init(self._norm1, L, dtype),
            "norm2": _stack_norm_init(self._norm2, L, dtype),
        }
        if c.gating == "none":
            p["mlp"] = {
                "linear1": trunc(keys[2], (L, d, c.dim_feedforward), d),
                "linear2": trunc(keys[3], (L, c.dim_feedforward, d), c.dim_feedforward),
            }
        else:
            h = c.hidden
            p["mlp"] = {
                "linear_in": trunc(keys[2], (L, W, d, 2 * h), d),
                "linear_out": trunc(keys[3], (L, W, h, d), h),
            }
        if self._ls is not None:
            p["layer_scale_1"] = {"scale": jnp.full((L, d), c.layer_scale, dtype)}
            p["layer_scale_2"] = {"scale": jnp.full((L, d), c.layer_scale, dtype)}
        if c.cross_attention:
            if not c.shared_cross_attn:
                p["cross_attn"] = self._init_xa_proj(keys[4], (L,), dtype)
            gate = self._init_xa_gate(keys[5], (L,), dtype)
            if gate is not None:
                p["cross_attn_gate"] = gate
            p["norm_cross"] = _stack_norm_init(self._norm_cross, L, dtype)
            if self._ls is not None:
                p["layer_scale_cross"] = {"scale": jnp.full((L, d), c.layer_scale, dtype)}
        return p

    # ------------------------------------------------------------------ state
    def init_state(self, batch_size: int, dtype=jnp.bfloat16,
                   capacity: int | None = None) -> dict:
        c = self.config
        cap = capacity if capacity is not None else c.kv_capacity
        shape = (c.num_layers, batch_size, cap, c.num_kv_heads, c.head_dim)
        state = {"offset": jnp.zeros((batch_size,), jnp.int32)}
        if c.kv_cache_dtype == "int4":
            # Nibble-packed cache in the ops/int4_attention.py layout: K and
            # V both [L, B, hd/2, cap] int8, CHANNEL-pair packed with
            # positions along lanes (byte at (row r, lane s) = channels
            # 2r/2r+1 of position s) — the layout whose blocks feed Mosaic's
            # batched int4 dots directly; a position's write is one plain
            # [hd/2] column scatter.  Scales transposed [L, B, H, cap].
            assert c.head_dim % 2 == 0
            hd = c.num_kv_heads * c.head_dim
            lead = shape[:2]  # (L, B)
            # lane (position) dim padded to a 128 multiple: Mosaic kernels
            # need lane-aligned blocks.  Cache AND scales are stored
            # lane-padded to cap_pad (padding the scale stacks per layer
            # inside the scan cost ~8.5 ms/frame — jnp.pad of loop-invariant
            # operands is not hoisted); the logical cap comes from the
            # config, and pad lanes are never written or attended (the
            # kernel masks them to -inf via the position bias)
            cap_pad = -(-cap // 128) * 128
            assert capacity is None or capacity == c.kv_capacity, \
                "int4 KV reads its logical capacity from the config"
            state.update(
                k=jnp.zeros(lead + (hd // 2, cap_pad), jnp.int8),
                v=jnp.zeros(lead + (hd // 2, cap_pad), jnp.int8),
                k_scale=jnp.zeros(lead + (c.num_kv_heads, cap_pad),
                                  jnp.bfloat16),
                v_scale=jnp.zeros(lead + (c.num_kv_heads, cap_pad),
                                  jnp.bfloat16),
            )
        elif c.kv_cache_dtype == "int8":
            state.update(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(shape[:-1] + (1,), jnp.bfloat16),
                v_scale=jnp.zeros(shape[:-1] + (1,), jnp.bfloat16),
            )
        else:
            state.update(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))
        return state

    def precompute_cross(self, params: dict, src: jax.Array) -> dict:
        """Precompute cross-attention K/V from `src` [B, Ts, kv_dim]
        (reference cross-attn KV caching: transformer.py:495-531; rust
        `CaSrc::KeysValues`).  Returns [L, B, Ts, H, Dh] per-layer K/V, or
        [B, Ts, H, Dh] (no layer axis) with shared_cross_attn."""
        c = self.config
        B, Ts, _ = src.shape

        def project(kv_w):
            kv = dot(src, kv_w.astype(src.dtype))  # [B, Ts, 2d]
            k, v = jnp.split(kv, 2, axis=-1)
            k = k.reshape(B, Ts, c.num_heads, c.head_dim)
            v = v.reshape(B, Ts, c.num_heads, c.head_dim)
            return k, v

        if c.shared_cross_attn:
            shared = params["cross_attn_shared"] if "cross_attn_shared" in params \
                else params
            k, v = project(shared["kv_proj"])
        else:
            layers = params.get("layers", params) if isinstance(params, dict) else params
            k, v = jax.vmap(lambda w: project(w))(layers["cross_attn"]["kv_proj"])
        return {"k_cross": k, "v_cross": v}

    def _apply_xa_gate(self, gate: dict | None, x: jax.Array) -> jax.Array:
        """Output gating of the cross-attention block (rust XaGate,
        transformer.rs:96-186).  Applied after out_proj, before the residual
        add."""
        g = self.config.cross_attention_gating
        if g == "normal" or gate is None:
            return x
        if g == "constant_gated_tanh":
            return x * jnp.tanh(gate["alpha"].astype(jnp.float32)).astype(x.dtype)
        if g == "constant_gated_sigmoid":
            return x * jax.nn.sigmoid(
                gate["alpha"].astype(jnp.float32) - 4.0).astype(x.dtype)
        # conditional: per-channel scales from a small MLP on x
        a = dot(x, gate["in_proj"].astype(x.dtype))
        a = jax.nn.relu(a)
        a = dot(a, gate["out_proj"].astype(a.dtype))
        if "bias" in gate:
            a = a + gate["bias"].astype(a.dtype)
        if "tanh" in g:
            a = jnp.tanh(a)
        elif g.endswith("learnable_bias"):
            a = jax.nn.sigmoid(a)
        else:
            a = jax.nn.sigmoid(a - 4.0)
        return x * a

    # ------------------------------------------------------------- layer body
    def _attention(self, q, k, v, mask, k_scale=None, v_scale=None):
        """q: [B, Hq, T, D]; k, v: [B, S, Hkv, D] (possibly int8); mask:
        broadcastable [B, 1, T, S].

        k_scale/v_scale: optional [B, S, Hkv, 1] per-row dequant scales for
        int8/int4 KV.  The per-row scale commutes with the contraction, so it
        is applied to the attention scores/weights (length-S vectors) instead
        of dequantizing the cache (which would materialize a bf16 copy in
        HBM).  With int4 KV, k/v arrive nibble-packed [B, S, Hkv, D/2] int8
        and `unpack` reinterprets them as [B, S, Hkv, D] int4 via bitcast —
        still a single pass over the packed bytes per dot.
        """
        c = self.config
        compute = q.dtype
        if k_scale is not None and c.kv_cache_dtype == "int4":
            # k/v: [B, hd/2, cap_pad] channel-pair packed; scales [B, H, cap].
            # Only the T>1 (prefill/chunked-test) path lands here — T=1
            # decode goes through _step_int4_decode / _int4_attention.
            # Materialized unpack, sliced back to the logical cap (cache and
            # scale lane dims are padded to a 128 multiple).
            cap_logical = mask.shape[-1] if mask is not None else k_scale.shape[-1]
            k = _unpack_int4_channel_major(k, c.num_kv_heads)[:, :cap_logical]
            v = _unpack_int4_channel_major(v, c.num_kv_heads)[:, :cap_logical]
            k_scale = k_scale.transpose(0, 2, 1)[:, :cap_logical, :, None]
            v_scale = v_scale.transpose(0, 2, 1)[:, :cap_logical, :, None]
        if c.kv_repeat > 1:
            k = jnp.repeat(k, c.kv_repeat, axis=2)
            v = jnp.repeat(v, c.kv_repeat, axis=2)
            if k_scale is not None:
                k_scale = jnp.repeat(k_scale, c.kv_repeat, axis=2)
                v_scale = jnp.repeat(v_scale, c.kv_repeat, axis=2)
        scale = 1.0 / math.sqrt(c.head_dim)
        if k_scale is not None and c.attention_int8_qk and c.kv_cache_dtype == "int8":
            # native int8 x int8 MXU scores: quantize q per (b, h, t) row
            qf = q.astype(jnp.float32)
            qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
            q_scale = jnp.maximum(qa, 1e-6) / 127.0
            qi = jnp.clip(jnp.round(qf / q_scale), -127, 127).astype(jnp.int8)
            scores = einsum("bhtd,bshd->bhts", qi, k,
                            preferred_element_type=jnp.int32).astype(jnp.float32)
            scores = scores * q_scale.astype(jnp.float32)
            scores = scores * k_scale.astype(jnp.float32).transpose(0, 2, 3, 1)
        else:
            scores = einsum("bhtd,bshd->bhts", q, k.astype(compute),
                            preferred_element_type=jnp.float32)
            if k_scale is not None:
                # [B, S, H, 1] -> [B, H, 1, S]
                scores = scores * k_scale.astype(jnp.float32).transpose(0, 2, 3, 1)
        scores = scores * scale
        if mask is not None:
            scores = jnp.where(mask, scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=-1)
        if v_scale is not None:
            w = w * v_scale.astype(jnp.float32).transpose(0, 2, 3, 1)
        out = einsum("bhts,bshd->bthd", w.astype(compute), v.astype(compute))
        return out.reshape(*out.shape[:2], -1)  # [B, T, Hq*D]

    def _layer(self, pl, x, *, complete_kv, mask, rope_offset,
               widx, k_cross=None, v_cross=None, xa_proj=None,
               int4_ctx=None):
        """One transformer layer.  Returns y.

        complete_kv(kk, vv) -> (k_att, v_att): injected KV-cache completion —
        identity for offline mode; in streaming mode it scatters the new rows
        into the (in-place, scan-carried) ring cache and returns the full
        cache view.
        """
        c = self.config
        B, T, d = x.shape
        H, Hkv, Dh = c.num_heads, c.num_kv_heads, c.head_dim

        # --- self attention
        h = self._norm1.apply(pl["norm1"], x)
        qkv = _per_step_linear(pl["attn"]["in_proj"], h, widx)
        q = qkv[..., :d].reshape(B, T, H, Dh)
        kk = qkv[..., d:d + Hkv * Dh].reshape(B, T, Hkv, Dh)
        vv = qkv[..., d + Hkv * Dh:].reshape(B, T, Hkv, Dh)

        if self.rope:
            qh = q.transpose(0, 2, 1, 3)
            kh = kk.transpose(0, 2, 1, 3)
            qh, kh = apply_rope(qh, kh, rope_offset,
                                max_period=c.max_period,
                                interleave=self.rope_interleave)
            q = qh.transpose(0, 2, 1, 3)
            kk = kh.transpose(0, 2, 1, 3)

        if int4_ctx is not None:
            attn = self._int4_attention(q, kk, vv, int4_ctx)
        else:
            k_att, v_att, k_scale, v_scale = complete_kv(kk, vv)
            attn = self._attention(q.transpose(0, 2, 1, 3), k_att, v_att, mask,
                                   k_scale=k_scale, v_scale=v_scale)
        attn = _per_step_linear(pl["attn"]["out_proj"], attn, widx)
        if "layer_scale_1" in pl:
            attn = pl["layer_scale_1"]["scale"].astype(attn.dtype) * attn
        x = x + attn

        # --- cross attention (optional)
        if k_cross is not None:
            proj = xa_proj if xa_proj is not None else pl["cross_attn"]
            h = self._norm_cross.apply(pl["norm_cross"], x)
            qx = wdot(h, proj["q_proj"])
            qx = qx.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
            ca = self._attention(qx, k_cross.astype(x.dtype), v_cross.astype(x.dtype), None)
            ca = wdot(ca, proj["out_proj"])
            ca = self._apply_xa_gate(pl.get("cross_attn_gate"), ca)
            if "layer_scale_cross" in pl:
                ca = pl["layer_scale_cross"]["scale"].astype(ca.dtype) * ca
            x = x + ca

        # --- feed forward
        h = self._norm2.apply(pl["norm2"], x)
        if c.gating == "none":
            u = wdot(h, pl["mlp"]["linear1"])
            u = jax.nn.gelu(u, approximate=False)
            u = wdot(u, pl["mlp"]["linear2"])
        else:
            u = _per_step_linear(pl["mlp"]["linear_in"], h, widx)
            a, b = jnp.split(u, 2, axis=-1)
            u = _activation(c.gating, a) * b
            u = _per_step_linear(pl["mlp"]["linear_out"], u, widx)
        if "layer_scale_2" in pl:
            u = pl["layer_scale_2"]["scale"].astype(u.dtype) * u
        x = x + u
        return x

    # ------------------------------------------------------------------ modes
    def _pos_embed(self, x: jax.Array, offset: jax.Array) -> jax.Array:
        c = self.config
        if c.positional_embedding in ("sin", "sin_rope"):
            B, T, C = x.shape
            positions = offset[:, None] + jnp.arange(T, dtype=offset.dtype)[None]
            pe = create_sin_embedding(positions, C, c.max_period)
            x = x + (c.positional_scale * pe).astype(x.dtype)
        return x

    def apply(self, params: dict, x: jax.Array, *,
              steps: jax.Array | None = None,
              cross_src: jax.Array | None = None) -> jax.Array:
        """Offline full-sequence forward (causal sliding-window mask, no cache).

        steps: [T] absolute step indices for weights_per_step models (defaults
        to arange(T)).
        """
        c = self.config
        B, T, _ = x.shape
        offset0 = jnp.zeros((B,), jnp.int32)
        x = self._pos_embed(x, offset0)

        widx = None
        if c.num_weights > 1:
            if steps is None:
                steps = jnp.arange(T, dtype=jnp.int32)
            widx = c.steps_to_weight_indices(steps)

        mask = None
        if c.causal:
            t = jnp.arange(T)
            delta = t[:, None] - t[None, :]
            m = delta >= 0
            if c.context is not None:
                m &= delta < c.context
            mask = m[None, None]

        cross = None
        shared = self.config.shared_cross_attn
        xa_shared = params.get("cross_attn_shared")
        if cross_src is not None:
            cross = self.precompute_cross(params, cross_src)

        rope_offset = jnp.zeros((B,), jnp.int32)

        layers_xs, rebuild = _split_q4_layers(params["layers"])

        def body(h, xs):
            kc = vc = None
            if cross is None:
                pl, l = xs
            elif shared:
                pl, l = xs
                kc, vc = cross["k_cross"], cross["v_cross"]
            else:
                pl, l, kc, vc = xs
            pl = rebuild(pl, l)
            y = self._layer(pl, h, complete_kv=lambda kk, vv: (kk, vv, None, None),
                            mask=mask, rope_offset=rope_offset, widx=widx,
                            k_cross=kc, v_cross=vc,
                            xa_proj=xa_shared if shared else None)
            return y, None

        larange = jnp.arange(c.num_layers)
        if cross is None or shared:
            xs = (layers_xs, larange)
        else:
            xs = (layers_xs, larange, cross["k_cross"], cross["v_cross"])
        if c.remat:
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        x, _ = lax.scan(body, x, xs)
        return x

    def step(self, params: dict, state: dict, x: jax.Array, *,
             exec_mask: jax.Array | None = None,
             steps: jax.Array | None = None) -> tuple[jax.Array, dict]:
        """Streaming forward of T new steps with the ring KV cache."""
        c = self.config
        B, T, _ = x.shape
        if c.kv_cache_dtype == "int4" and T == 1:
            return self._step_int4_decode(params, state, x,
                                          exec_mask=exec_mask, steps=steps)
        offset = state["offset"]
        if c.kv_cache_dtype == "int4":
            cap = c.kv_capacity  # cache arrays are lane-padded past this
        else:
            cap = state["k"].shape[2]
        x = self._pos_embed(x, offset)

        widx = None
        if c.num_weights > 1:
            if steps is None:
                steps = jnp.arange(T, dtype=jnp.int32)
            widx = c.steps_to_weight_indices(steps)

        write_idx = (offset[:, None] + jnp.arange(T, dtype=offset.dtype)) % cap  # [B, T]
        pos_k, offset_next = ring_positions(offset, T, cap, exec_mask)
        pos_q = offset[:, None] + jnp.arange(T, dtype=offset.dtype)[None]        # [B, T]
        delta = pos_q[:, :, None] - pos_k[:, None, :]                            # [B, T, cap]
        mask = (pos_k[:, None, :] >= 0) & (delta >= 0)
        if c.context is not None:
            mask &= delta < c.context
        mask = mask[:, None]  # [B, 1, T, cap]

        has_cross = "k_cross" in state
        shared = self.config.shared_cross_attn
        xa_shared = params.get("cross_attn_shared")
        barange = jnp.arange(B)

        # KV caches ride the scan CARRY with per-layer dynamic updates: XLA
        # bufferizes loop carries in place, so each step writes only the new
        # [B, T, H, D] rows instead of copying the whole [L, B, cap, H, D]
        # stack to fresh scan outputs (which costs ~2x cache size in HBM
        # traffic per frame on the 7B).
        int8_kv = c.kv_cache_dtype in ("int8", "int4")
        int4_kv = c.kv_cache_dtype == "int4"
        quant_rows = _quant_rows_int4 if int4_kv else _quant_rows

        layers_xs, rebuild = _split_q4_layers(params["layers"])

        def body(carry, xs):
            if int8_kv:
                h, k_all, v_all, ks_all, vs_all = carry
            else:
                h, k_all, v_all = carry
            if has_cross and not shared:
                pl, l, kx, vx = xs
            else:
                pl, l = xs
                kx = vx = None
                if has_cross:
                    kx, vx = state["k_cross"], state["v_cross"]
            pl = rebuild(pl, l)

            def complete_kv(kk, vv):
                nonlocal k_all, v_all
                if int8_kv:
                    nonlocal ks_all, vs_all
                    (kq, ks), (vq, vs) = quant_rows(kk), quant_rows(vv)
                    if int4_kv:
                        # channel-pair packed column writes: a position's
                        # channels live in one [hd/2] column, so each write
                        # touches whole bytes (no read-modify-write)
                        kqf = kq.reshape(B, T, -1)
                        vqf = vq.reshape(B, T, -1)
                        for t in range(T):
                            pos = write_idx[:, t]
                            kcol = _pack_nibble_cols(kqf[:, t])
                            vcol = _pack_nibble_cols(vqf[:, t])
                            k_all = k_all.at[l, barange, :, pos].set(kcol)
                            v_all = v_all.at[l, barange, :, pos].set(vcol)
                            ks_all = ks_all.at[l, barange, :, pos].set(
                                ks[:, t, :, 0].astype(ks_all.dtype))
                            vs_all = vs_all.at[l, barange, :, pos].set(
                                vs[:, t, :, 0].astype(vs_all.dtype))
                        return k_all[l], v_all[l], ks_all[l], vs_all[l]
                    k_all = k_all.at[l, barange[:, None], write_idx].set(kq)
                    v_all = v_all.at[l, barange[:, None], write_idx].set(vq)
                    ks_all = ks_all.at[l, barange[:, None], write_idx].set(
                        ks.astype(ks_all.dtype))
                    vs_all = vs_all.at[l, barange[:, None], write_idx].set(
                        vs.astype(vs_all.dtype))
                    return k_all[l], v_all[l], ks_all[l], vs_all[l]
                k_all = k_all.at[l, barange[:, None], write_idx].set(
                    kk.astype(k_all.dtype))
                v_all = v_all.at[l, barange[:, None], write_idx].set(
                    vv.astype(v_all.dtype))
                return k_all[l], v_all[l], None, None

            y = self._layer(pl, h, complete_kv=complete_kv, mask=mask,
                            rope_offset=offset, widx=widx,
                            k_cross=kx, v_cross=vx,
                            xa_proj=xa_shared if shared else None)
            if int8_kv:
                return (y, k_all, v_all, ks_all, vs_all), None
            return (y, k_all, v_all), None

        larange = jnp.arange(c.num_layers)
        if has_cross and not shared:
            xs = (layers_xs, larange, state["k_cross"], state["v_cross"])
        else:
            xs = (layers_xs, larange)
        new_state = dict(state)
        if int8_kv:
            carry0 = (x, state["k"], state["v"], state["k_scale"], state["v_scale"])
            (x, k_new, v_new, ks_new, vs_new), _ = lax.scan(body, carry0, xs)
            new_state.update(k_scale=ks_new, v_scale=vs_new)
        else:
            (x, k_new, v_new), _ = lax.scan(body, (x, state["k"], state["v"]), xs)
        new_state.update(k=k_new, v=v_new, offset=offset_next)
        return x, new_state

    # --------------------------------------------------------- int4 decode
    def _step_int4_decode(self, params: dict, state: dict, x: jax.Array, *,
                          exec_mask: jax.Array | None = None,
                          steps: jax.Array | None = None):
        """One decode step (T=1) over the int4-packed ring KV cache.

        Structure (each point measured on-chip; see ops/int4_attention.py):
        - attention reads the packed cache stacks DIRECTLY (scalar-prefetch
          layer indexing — slicing a layer out for a pallas call copies it);
        - the kernel returns unnormalized flash state and the CURRENT
          frame's K/V row is injected analytically (unquantized — slightly
          more accurate than the int8 path's read-back of the quantized
          row);
        - cache writes are deferred to one dynamic-update-slice per slot
          after the layer scan: in-scan lane scatters made XLA choose a
          scatter-friendly transposed cache layout and copy the whole cache
          every frame, and per-(layer, slot) update chains were op-latency
          bound.
        """
        c = self.config
        B, T, _ = x.shape
        offset = state["offset"]
        cap = c.kv_capacity  # cache arrays are lane-padded past this
        x = self._pos_embed(x, offset)

        widx = None
        if c.num_weights > 1:
            if steps is None:
                steps = jnp.arange(T, dtype=jnp.int32)
            widx = c.steps_to_weight_indices(steps)

        wp = offset % cap                                        # [B]
        pos_k, offset_next = ring_positions(offset, T, cap, exec_mask)
        delta = offset[:, None] - pos_k                          # [B, cap]
        mask = (pos_k >= 0) & (delta >= 0)
        if c.context is not None:
            mask &= delta < c.context
        # the cache row at the write position is stale (the fresh row is
        # injected separately); never attend it through the cache
        lane = jnp.arange(cap)
        mask &= lane[None, :] != wp[:, None]
        cur_valid = exec_mask if exec_mask is not None \
            else jnp.ones((B,), bool)

        has_cross = "k_cross" in state
        shared = c.shared_cross_attn
        xa_shared = params.get("cross_attn_shared")

        k_all, v_all = state["k"], state["v"]
        ks_all, vs_all = state["k_scale"], state["v_scale"]

        layers_xs, rebuild = _split_q4_layers(params["layers"])

        def body(h, xs):
            if has_cross and not shared:
                pl_, l, kx, vx = xs
            else:
                pl_, l = xs
                kx = vx = None
                if has_cross:
                    kx, vx = state["k_cross"], state["v_cross"]
            pl_ = rebuild(pl_, l)
            ictx = {"layer": l, "k_all": k_all, "v_all": v_all,
                    "ks_all": ks_all, "vs_all": vs_all, "mask": mask,
                    "cur_valid": cur_valid, "cap": cap}
            y = self._layer(pl_, h, complete_kv=None, mask=None,
                            rope_offset=offset, widx=widx,
                            k_cross=kx, v_cross=vx,
                            xa_proj=xa_shared if shared else None,
                            int4_ctx=ictx)
            return y, ictx["cols"]

        larange = jnp.arange(c.num_layers)
        if has_cross and not shared:
            xs = (layers_xs, larange, state["k_cross"], state["v_cross"])
        else:
            xs = (layers_xs, larange)
        x, cols = lax.scan(body, x, xs)
        kcols, vcols, kscols, vscols = cols  # [L, B, hd/2] / [L, B, H]

        # deferred writes, all layers at once
        L = c.num_layers
        hd2 = k_all.shape[2]
        H = c.num_kv_heads
        from ..ops.q4matmul import use_pallas
        if use_pallas() and c.kv_repeat == 1:
            # fused DMA write kernel: the 4*B-op DUS chain below is
            # op-latency bound (~2 ms/frame at B=8)
            from ..ops.int4_attention import cache_write_int4
            k_all, v_all, ks_all, vs_all = cache_write_int4(
                wp, kcols, vcols, kscols, vscols,
                k_all, v_all, ks_all, vs_all)
        else:
            for b in range(B):
                pos_b = wp[b]
                k_all = lax.dynamic_update_slice(
                    k_all, kcols[:, b].reshape(L, 1, hd2, 1), (0, b, 0, pos_b))
                v_all = lax.dynamic_update_slice(
                    v_all, vcols[:, b].reshape(L, 1, hd2, 1), (0, b, 0, pos_b))
                ks_all = lax.dynamic_update_slice(
                    ks_all, kscols[:, b].reshape(L, 1, H, 1), (0, b, 0, pos_b))
                vs_all = lax.dynamic_update_slice(
                    vs_all, vscols[:, b].reshape(L, 1, H, 1), (0, b, 0, pos_b))

        new_state = dict(state)
        new_state.update(k=k_all, v=v_all, k_scale=ks_all, v_scale=vs_all,
                         offset=offset_next)
        return x, new_state

    def _int4_attention(self, q, kk, vv, ictx) -> jax.Array:
        """Decode attention over the packed int4 cache + the current row.

        q: [B, T=1, H, D] (rope'd, head-minor); kk/vv: [B, T=1, Hkv, D]
        (rope'd current rows).  Quantizes/packs the current rows into
        ictx["cols"] for the deferred write, runs the cache pass (Pallas on
        TPU, dense fallback elsewhere), and merges the current row via
        flash-combine.  Returns [B, T, H*D]."""
        c = self.config
        B = q.shape[0]
        H, D = c.num_heads, c.head_dim
        (kq, ks), (vq, vs) = _quant_rows_int4(kk), _quant_rows_int4(vv)
        ictx["cols"] = (_pack_nibble_cols(kq.reshape(B, -1)),
                        _pack_nibble_cols(vq.reshape(B, -1)),
                        ks[:, 0, :, 0].astype(jnp.bfloat16),
                        vs[:, 0, :, 0].astype(jnp.bfloat16))

        layer = ictx["layer"]
        mask = ictx["mask"]
        cur_valid = ictx["cur_valid"]
        cap = ictx["cap"]
        qh = q.transpose(0, 2, 1, 3)                     # [B, H, 1, D]
        from ..ops.q4matmul import use_pallas
        if use_pallas() and c.kv_repeat == 1:
            from ..ops.int4_attention import decode_attention_int4_stats
            acc, m, l = decode_attention_int4_stats(
                qh, layer, ictx["k_all"], ictx["v_all"],
                ictx["ks_all"], ictx["vs_all"], mask)
        else:
            # dense fallback (CPU tests / GQA): dequantize this layer
            Hkv = c.num_kv_heads
            kd = _unpack_int4_channel_major(ictx["k_all"][layer], Hkv)[:, :cap]
            vd = _unpack_int4_channel_major(ictx["v_all"][layer], Hkv)[:, :cap]
            ksl = ictx["ks_all"][layer].transpose(0, 2, 1)[:, :cap]  # [B,cap,H]
            vsl = ictx["vs_all"][layer].transpose(0, 2, 1)[:, :cap]
            kf = kd.astype(jnp.float32) * ksl[..., None].astype(jnp.float32)
            vf = vd.astype(jnp.float32) * vsl[..., None].astype(jnp.float32)
            if c.kv_repeat > 1:
                kf = jnp.repeat(kf, c.kv_repeat, axis=2)
                vf = jnp.repeat(vf, c.kv_repeat, axis=2)
            scores = einsum("bhtd,bshd->bhts", qh.astype(jnp.float32), kf,
                            preferred_element_type=jnp.float32)
            scores = scores[:, :, 0, :] / math.sqrt(D)   # [B, H, cap]
            scores = jnp.where(mask[:, None, :], scores, -1e30)
            m = jnp.max(scores, axis=-1, keepdims=True)  # [B, H, 1]
            p = jnp.exp(scores - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = einsum("bhs,bshd->bhd", p, vf)

        # flash-merge the current (unquantized) rows
        k_cur = kk[:, 0]                                 # [B, Hkv, D]
        v_cur = vv[:, 0]
        if c.kv_repeat > 1:
            k_cur = jnp.repeat(k_cur, c.kv_repeat, axis=1)
            v_cur = jnp.repeat(v_cur, c.kv_repeat, axis=1)
        s_cur = jnp.sum(qh[:, :, 0, :].astype(jnp.float32)
                        * k_cur.astype(jnp.float32), -1, keepdims=True)
        s_cur = s_cur / math.sqrt(D)                     # [B, H, 1]
        s_cur = jnp.where(cur_valid[:, None, None], s_cur, -1e30)
        m2 = jnp.maximum(m, s_cur)
        a1 = jnp.exp(m - m2)
        a2 = jnp.exp(s_cur - m2)
        out = (acc * a1 + a2 * v_cur.astype(jnp.float32)) \
            / (l * a1 + a2 + 1e-30)
        return out.reshape(B, 1, H * D).astype(q.dtype)


def _quant_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization per (batch, time, head) row of [B, T, H, D]."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_rows_int4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric int4 quantization per (batch, time, head) row of
    [B, T, H, D]: values in [-7, 7] stored in int8 (channel-pair packing
    happens at the cache write — `_pack_nibble_cols` on the XLA path, fused
    inside `ops.int4_attention.cache_write_int4` on the Pallas path),
    scale [B, T, H, 1] f32."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 7.0
    q = jnp.clip(jnp.round(xf / scale), -7, 7).astype(jnp.int8)
    return q, scale


def _pack_nibble_cols(vals: jax.Array) -> jax.Array:
    """int4 values [B, H*D] (one position's channels) -> channel-pair packed
    bytes [B, H*D/2]: channel 2r in the low nibble, 2r+1 in the high."""
    return (vals[:, 1::2] << 4) | (vals[:, 0::2] & jnp.int8(15))


def _unpack_int4_channel_major(x: jax.Array, heads: int) -> jax.Array:
    """[B, hd/2, cap] channel-pair packed int8 -> [B, cap, H, D] int4
    (XLA fallback for the K cache layout)."""
    u = lax.bitcast_convert_type(x, jnp.int4)      # [B, hd/2, cap, 2]
    u = u.transpose(0, 2, 1, 3)                    # [B, cap, hd/2, 2]
    B, cap, h2, _ = u.shape
    return u.reshape(B, cap, heads, 2 * h2 // heads)


def _stack_norm_init(norm, L: int, dtype) -> dict:
    p = norm.init_params(jax.random.PRNGKey(0), dtype)
    return {k: jnp.broadcast_to(v, (L,) + v.shape).copy() for k, v in p.items()}


def _activation(name: str, x: jax.Array) -> jax.Array:
    if name == "silu":
        return jax.nn.silu(x)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    raise ValueError(f"unknown activation {name}")


class ProjectedTransformer:
    """Transformer with optional input/output dimension projections
    (transformer.py:932-983).  Layout is [B, T, C]; the Mimi model handles the
    reference's conv_layout [B, C, T] transposes at its API boundary."""

    def __init__(self, config: TransformerConfig, input_dimension: int,
                 output_dimensions: tuple[int, ...]):
        self.transformer = StreamingTransformer(config)
        self.config = config
        self.input_dimension = input_dimension
        self.output_dimensions = output_dimensions

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        c = self.config
        keys = jax.random.split(key, 2 + len(self.output_dimensions))
        p = {"layers": self.transformer._init_layer_params(keys[0], dtype)}
        if self.input_dimension != c.d_model:
            p["input_proj"] = _linear_init(keys[1], self.input_dimension, c.d_model, dtype)
        outs = []
        for i, od in enumerate(self.output_dimensions):
            if od == c.d_model:
                outs.append({})
            else:
                outs.append({"weight": _linear_init(keys[2 + i], c.d_model, od, dtype)["weight"]})
        p["output_projs"] = outs
        return p

    def init_state(self, batch_size: int, dtype=jnp.float32) -> dict:
        return self.transformer.init_state(batch_size, dtype)

    def _project_in(self, params, x):
        if "input_proj" in params:
            x = dot(x, params["input_proj"]["weight"].astype(x.dtype))
        return x

    def _project_out(self, params, z):
        ys = []
        for op in params["output_projs"]:
            ys.append(dot(z, op["weight"].astype(z.dtype)) if "weight" in op else z)
        return ys

    def apply(self, params: dict, x: jax.Array) -> list[jax.Array]:
        x = self._project_in(params, x)
        z = self.transformer.apply({"layers": params["layers"]}, x)
        return self._project_out(params, z)

    def step(self, params: dict, state: dict, x: jax.Array,
             exec_mask: jax.Array | None = None) -> tuple[list[jax.Array], dict]:
        x = self._project_in(params, x)
        z, state = self.transformer.step({"layers": params["layers"]}, state, x,
                                         exec_mask=exec_mask)
        return self._project_out(params, z), state


def _linear_init(key: jax.Array, din: int, dout: int, dtype) -> dict:
    std = 1.0 / math.sqrt(din)
    w = jax.random.truncated_normal(key, -3.0, 3.0, (din, dout), jnp.float32) * std
    return {"weight": w.astype(dtype)}
