"""Moshi RQ-Transformer language model: Temporal Transformer + Depformer.

Behavioral reference: `moshi/moshi/models/lm.py` —
- `LMModel` (49-519): per-codebook `ScaledEmbedding`s summed with the text
  embedding (390-397); main transformer + `out_norm` + `text_linear`;
  Depformer with per-codebook input linears, per-codebook embeddings and
  output heads, weights-per-step transformer (160-232);
- special tokens (245-277): `zero_token_id=-1` embeds to exactly zero,
  `ungenerated_token_id=-2`, initial tokens = `card`/`text_card`;
- training `forward` (322-377): delay -> forward_text ->
  forward_depformer_training -> undelay with NaN fill and validity masks;
- `_delay_sequence`/`_undelay_sequence` (`models/lm_utils.py:9-38`).

TPU-native design: the Depformer's 8 sequential inner steps run as a
`lax.scan` over stacked per-step weights with on-device sampling, so one
whole frame (temporal forward + text sample + 8 depformer steps) is a single
XLA program — the analog of the reference's two CUDA graphs (lm.py:629-634).
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ..modules.norm import make_norm
from ..modules.transformer import TransformerConfig, StreamingTransformer
from ..utils.matmul import dot, einsum, wdot
from ..utils.sampling import sample_token
from ..utils.quantize import take0


ZERO_TOKEN = -1        # embeds to exactly 0 (lm.py:266-269)
UNGENERATED_TOKEN = -2  # "to be predicted" marker (lm.py:271-277)


@dataclass(frozen=True)
class LmConfig:
    dim: int = 128
    num_heads: int = 8
    num_layers: int = 2
    hidden_scale: float = 4.125
    n_q: int = 8
    dep_q: int = 8
    card: int = 1024
    text_card: int = 32000
    text_card_out: int | None = None
    norm: str = "rms_norm_f32"
    context: int | None = 100
    causal: bool = True
    # layer-wise activation remat in the temporal transformer's training
    # forward (modules/transformer.py TransformerConfig.remat)
    remat: bool = False
    max_period: float = 10_000.0
    gating: str = "silu"
    positional_embedding: str = "rope"
    layer_scale: float | None = None
    kv_repeat: int = 1
    cross_attention: bool = False
    # XaGate zoo + cross-attn options (rust transformer.rs:96-186, lm.rs presets)
    cross_attention_gating: str = "normal"
    cross_attention_norm: str = "layer_norm"
    cross_attention_kv_dim: int | None = None
    shared_cross_attn: bool = False
    kv_cache_dtype: str = "model"  # model | int8 | int4 (TPU-native extension)
    attention_int8_qk: bool = False  # int8 KV: native int8 QK^T scores
    delays: tuple[int, ...] = (0,) * 9
    existing_text_padding_id: int = 3
    existing_text_end_padding_id: int = 0
    extra_heads_num_heads: int = 0
    extra_heads_dim: int = 6
    demux_second_text_stream: bool = False
    # Depformer
    depformer_dim: int = 256
    depformer_num_heads: int = 8
    depformer_num_layers: int = 2
    depformer_dim_feedforward: int | None = None
    depformer_gating: str = "silu"
    depformer_norm: str | None = None  # None -> same as `norm`
    depformer_kv_repeat: int = 1
    depformer_pos_emb: str = "none"
    depformer_max_period: float = 10_000.0
    depformer_layer_scale: float | None = None
    depformer_multi_linear: bool = True
    depformer_weights_per_step: bool = True
    depformer_weights_per_step_schedule: tuple[int, ...] | None = None
    depformer_low_rank_embeddings: int | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "LmConfig":
        """Build from the reference `config.json` schema (see configs/*.json
        and loaders.py:222-234 in the reference)."""
        d = dict(d)
        # Keys consumed by CheckpointInfo / deprecated keys.
        for k in ("moshi_name", "mimi_name", "mimi_config_name", "tokenizer_name",
                  "lora_name", "model_type", "lm_gen_config", "tts_config",
                  "stt_config", "model_id", "depformer_causal", "lora",
                  "lora_rank", "lora_scaling", "quantize", "conditioners",
                  "fuser", "depformer_context"):
            d.pop(k, None)
        if "demux_second_stream" in d:
            d["demux_second_text_stream"] = d.pop("demux_second_stream")
        known = set(cls.__dataclass_fields__)
        unknown = {k for k in d if k not in known}
        if unknown:
            raise ValueError(f"unknown LM config keys: {sorted(unknown)}")
        if "delays" in d:
            d["delays"] = tuple(d["delays"])
        if d.get("depformer_weights_per_step_schedule") is not None:
            d["depformer_weights_per_step_schedule"] = tuple(
                d["depformer_weights_per_step_schedule"])
        return cls(**d)

    # -------------------------------------------------------------- derived
    @property
    def num_codebooks(self) -> int:
        return self.n_q + 1

    @property
    def audio_offset(self) -> int:
        return 1

    @property
    def initial_token_id(self) -> int:
        return self.card

    @property
    def text_initial_token_id(self) -> int:
        return self.text_card

    @property
    def text_out_card(self) -> int:
        return self.text_card if self.text_card_out is None else self.text_card_out

    @property
    def max_delay(self) -> int:
        return max(self.delays)

    @property
    def transformer_config(self) -> TransformerConfig:
        return TransformerConfig(
            d_model=self.dim, num_heads=self.num_heads, num_layers=self.num_layers,
            dim_feedforward=int(self.hidden_scale * self.dim), causal=self.causal,
            context=self.context, positional_embedding=self.positional_embedding,
            max_period=self.max_period, gating=self.gating, norm=self.norm,
            layer_scale=self.layer_scale, kv_repeat=self.kv_repeat,
            cross_attention=self.cross_attention,
            cross_attention_gating=self.cross_attention_gating,
            cross_attention_norm=self.cross_attention_norm,
            cross_attention_kv_dim=self.cross_attention_kv_dim,
            shared_cross_attn=self.shared_cross_attn,
            kv_cache_dtype=self.kv_cache_dtype,
            attention_int8_qk=self.attention_int8_qk,
            remat=self.remat)

    @property
    def depformer_config(self) -> TransformerConfig:
        ff = self.depformer_dim_feedforward
        if ff is None:
            ff = int(self.hidden_scale * self.depformer_dim)
        return TransformerConfig(
            d_model=self.depformer_dim, num_heads=self.depformer_num_heads,
            num_layers=self.depformer_num_layers, dim_feedforward=ff,
            causal=self.causal, context=None,
            positional_embedding=self.depformer_pos_emb,
            max_period=self.depformer_max_period, gating=self.depformer_gating,
            norm=self.depformer_norm or self.norm,
            kv_repeat=self.depformer_kv_repeat,
            layer_scale=self.depformer_layer_scale,
            weights_per_step=self.dep_q if self.depformer_weights_per_step else 0,
            weights_per_step_schedule=self.depformer_weights_per_step_schedule)

    @property
    def num_depformer_in(self) -> int:
        if not self.depformer_multi_linear:
            return 1
        if self.depformer_weights_per_step_schedule is not None:
            return max(self.depformer_weights_per_step_schedule) + 1
        return self.dep_q

    def depformer_in_index(self, k) -> jax.Array:
        """Which depformer_in linear to use for codebook k (lm.py:471-477)."""
        if not self.depformer_multi_linear:
            return jnp.zeros_like(jnp.asarray(k))
        if self.depformer_weights_per_step_schedule is not None:
            return jnp.asarray(self.depformer_weights_per_step_schedule, jnp.int32)[k]
        return jnp.asarray(k)


def embed(table_params: dict, tokens: jax.Array, dtype=None) -> jax.Array:
    """ScaledEmbedding semantics (models/lm_utils.py:66-124): token -1 embeds
    to exactly zero; negative tokens are clamped before lookup; optional
    low-rank expansion; optional demuxing of a second muxed stream
    (`(tok2 + 1) * card + tok1`, lm_utils.py:102-116) through the out1/out2
    linears."""
    w = table_params["weight"]
    is_zero = tokens == ZERO_TOKEN
    tokens = jnp.clip(tokens, 0, None)
    if "out1" in table_params:  # demux_second_stream
        card = w.shape[0]
        left = tokens % card
        right = tokens // card - 1
        right_zero = (right < 0)[..., None]
        le = jnp.take(w, left, axis=0, mode="clip")
        re = jnp.take(w, jnp.clip(right, 0, None), axis=0, mode="clip")
        y = dot(le, table_params["out1"].astype(le.dtype))
        y = y + jnp.where(right_zero, jnp.zeros((), y.dtype),
                          dot(re, table_params["out2"].astype(re.dtype)))
        y = jnp.where(is_zero[..., None], jnp.zeros((), y.dtype), y)
        if dtype is not None:
            y = y.astype(dtype)
        return y
    # mode="clip": the default take fills out-of-bounds with NaN, which would
    # poison the streaming state forever; clients can send garbage tokens.
    y = jnp.take(w, tokens, axis=0, mode="clip")
    y = jnp.where(is_zero[..., None], jnp.zeros((), y.dtype), y)
    if "low_rank" in table_params:
        y = dot(y, table_params["low_rank"])
    if dtype is not None:
        y = y.astype(dtype)
    return y


def delay_sequence(delays: tuple[int, ...], tokens: jax.Array,
                   initial: jax.Array) -> jax.Array:
    """tokens: [B, K, T]; per-codebook right-roll by delay with the initial
    token filling the head (lm_utils.py:9-20)."""
    B, K, T = tokens.shape
    assert len(delays) == K
    outs = []
    for k, d in enumerate(delays):
        line = jnp.roll(tokens[:, k], d, axis=1)
        if d > 0:
            line = line.at[:, :d].set(initial[:, k][:, None])
        outs.append(line)
    return jnp.stack(outs, axis=1)


def undelay_logits(delays: tuple[int, ...], logits: jax.Array
                   ) -> tuple[jax.Array, jax.Array]:
    """logits: [B, K, T, card]; left-roll each codebook by its delay, fill the
    tail with NaN, and return a validity mask (lm_utils.py:23-38)."""
    B, K, T = logits.shape[:3]
    assert len(delays) == K
    mask = jnp.ones((B, K, T), bool)
    outs = []
    for k, d in enumerate(delays):
        line = jnp.roll(logits[:, k], -d, axis=1)
        if d > 0:
            line = line.at[:, T - d:].set(jnp.nan)
            mask = mask.at[:, k, T - d:].set(False)
        outs.append(line)
    return jnp.stack(outs, axis=1), mask


class LMModel:
    def __init__(self, config: LmConfig):
        self.config = config
        self.transformer = StreamingTransformer(config.transformer_config)
        self.depformer = StreamingTransformer(config.depformer_config) if config.dep_q > 0 else None
        self._out_norm = make_norm(config.norm, config.dim)

    # ------------------------------------------------------------------ params
    def init_params(self, key: jax.Array, dtype=jnp.bfloat16) -> dict:
        c = self.config
        keys = jax.random.split(key, 12)

        def trunc(key, shape, fan_in):
            std = 1.0 / math.sqrt(fan_in)
            return (jax.random.truncated_normal(key, -3.0, 3.0, shape, jnp.float32) * std).astype(dtype)

        lr = c.depformer_low_rank_embeddings
        p = {
            "text_emb": {"weight": trunc(keys[0], (c.text_card + 1, c.dim), c.dim)},
            "emb": {"weight": trunc(keys[1], (c.n_q, c.card + 1, c.dim), c.dim)},
            "transformer": self.transformer.init_params(keys[2], dtype),
            "out_norm": _f32_tree(self._out_norm.init_params(keys[3], dtype)),
            "text_linear": {"weight": trunc(keys[4], (c.dim, c.text_out_card), c.dim)},
        }
        if c.extra_heads_num_heads:
            p["extra_heads"] = {"weight": trunc(
                keys[5], (c.extra_heads_num_heads, c.dim, c.extra_heads_dim), c.dim)}
        if self.depformer is not None:
            dd = c.depformer_dim
            p.update({
                "depformer_in": {"weight": trunc(keys[6], (c.num_depformer_in, c.dim, dd), c.dim)},
                "depformer_text_emb": {"weight": trunc(keys[7], (c.text_card + 1, lr or dd), lr or dd)},
                "depformer_emb": {"weight": trunc(keys[8], (c.dep_q - 1, c.card + 1, lr or dd), lr or dd)},
                "depformer": self.depformer.init_params(keys[9], dtype),
                "linears": {"weight": trunc(keys[10], (c.dep_q, dd, c.card), dd)},
            })
            if lr is not None:
                p["depformer_text_emb"]["low_rank"] = trunc(keys[11], (lr, dd), lr)
                p["depformer_emb"]["low_rank"] = trunc(keys[11], (c.dep_q - 1, lr, dd), lr)
        return p

    # ------------------------------------------------------------------ pieces
    def embed_inputs(self, params: dict, sequence: jax.Array) -> jax.Array:
        """sequence: [B, K=1+n_q, T] token ids -> summed embeddings [B, T, dim]
        (lm.py:390-397)."""
        c = self.config
        audio = sequence[:, c.audio_offset:c.audio_offset + c.n_q]  # [B, n_q, T]
        w = params["emb"]["weight"]  # [n_q, card+1, dim]

        def one(table, toks):
            return embed({"weight": table}, toks)

        audio_emb = jax.vmap(one, in_axes=(0, 1), out_axes=0)(w, audio)  # [n_q, B, T, dim]
        input_ = jnp.sum(audio_emb, axis=0)
        input_ = input_ + embed(params["text_emb"], sequence[:, 0])
        return input_

    def _text_head(self, params: dict, h: jax.Array) -> tuple[jax.Array, jax.Array]:
        h = self._out_norm.apply(params["out_norm"], h)
        text_logits = wdot(h, params["text_linear"]["weight"])
        return h, text_logits

    def forward_text(self, params: dict, sequence: jax.Array,
                     sum_condition: jax.Array | None = None,
                     cross_src: jax.Array | None = None
                     ) -> tuple[jax.Array, jax.Array]:
        """Offline temporal forward. sequence: [B, K, S] -> (h [B, S, dim],
        text_logits [B, 1, S, text_card])."""
        input_ = self.embed_inputs(params, sequence)
        if sum_condition is not None:
            input_ = input_ + sum_condition.astype(input_.dtype)
        h = self.transformer.apply(params["transformer"], input_, cross_src=cross_src)
        h, text_logits = self._text_head(params, h)
        return h, text_logits[:, None]

    def forward_text_step(self, params: dict, tr_state: dict, sequence: jax.Array,
                          sum_condition: jax.Array | None = None,
                          exec_mask: jax.Array | None = None
                          ) -> tuple[jax.Array, jax.Array, dict]:
        """Streaming temporal forward of one (or more) steps."""
        input_ = self.embed_inputs(params, sequence)
        if sum_condition is not None:
            input_ = input_ + sum_condition.astype(input_.dtype)
        h, tr_state = self.transformer.step(params["transformer"], tr_state, input_,
                                            exec_mask=exec_mask)
        h, text_logits = self._text_head(params, h)
        return h, text_logits[:, None], tr_state

    # --------------------------------------------------------------- training
    def forward(self, params: dict, codes: jax.Array,
                sum_condition: jax.Array | None = None,
                cross_src: jax.Array | None = None) -> dict:
        """Teacher-forced training/eval forward (lm.py:322-377).

        codes: [B, K=1+n_q, T] (text stream first).  Returns dict with
        `logits` [B, dep_q, T, card], `mask`, `text_logits`, `text_mask` —
        all re-aligned with the input codes.
        """
        c = self.config
        B, K, T = codes.shape
        assert K == c.num_codebooks, (K, c.num_codebooks)
        initial = self._initial_token(B)
        delayed = delay_sequence(c.delays, codes, initial)
        delayed = jnp.concatenate([initial[:, :, None], delayed], axis=2)

        h, text_logits = self.forward_text(params, delayed[:, :, :-1], sum_condition,
                                           cross_src)
        logits = self.forward_depformer_training(params, delayed[:, :, 1:], h)

        logits, mask = undelay_logits(
            c.delays[c.audio_offset:c.audio_offset + c.dep_q], logits)
        mask &= codes[:, c.audio_offset:c.audio_offset + c.dep_q] != ZERO_TOKEN
        text_logits, text_mask = undelay_logits(c.delays[:1], text_logits)
        text_mask &= codes[:, :1] != ZERO_TOKEN
        return {"logits": logits, "mask": mask,
                "text_logits": text_logits, "text_mask": text_mask}

    def forward_depformer_training(self, params: dict, delayed: jax.Array,
                                   h: jax.Array) -> jax.Array:
        """delayed: [B, K, T] *shifted* target tokens; h: [B, T, dim] temporal
        output.  One parallel depformer pass over all T frames (lm.py:410-448).
        """
        c = self.config
        B, K, T = delayed.shape
        dd = c.depformer_dim
        win = params["depformer_in"]["weight"]  # [num_in, dim, dd]
        idx = c.depformer_in_index(jnp.arange(c.dep_q))
        win = take0(win, idx).astype(h.dtype)  # [dep_q, dim, dd]
        tr_in = einsum("btd,kde->bkte", h, win)  # [B, dep_q, T, dd]

        tok_in = [embed(params["depformer_text_emb"], delayed[:, 0], tr_in.dtype)]
        demb = params["depformer_emb"]
        for k in range(1, c.dep_q):
            table = {"weight": demb["weight"][k - 1]}
            if "low_rank" in demb:
                table["low_rank"] = demb["low_rank"][k - 1]
            tok_in.append(embed(table, delayed[:, k + c.audio_offset - 1], tr_in.dtype))
        tok_in = jnp.stack(tok_in, axis=1)  # [B, dep_q, T, dd]

        dep_input = (tr_in + tok_in).transpose(0, 2, 1, 3).reshape(B * T, c.dep_q, dd)
        dep_out = self.depformer.apply(params["depformer"], dep_input,
                                       steps=jnp.arange(c.dep_q, dtype=jnp.int32))
        wlin = params["linears"]["weight"]  # [dep_q, dd, card]
        logits = einsum("nkd,kdc->nkc", dep_out, wlin.astype(dep_out.dtype))
        logits = logits.reshape(B, T, c.dep_q, c.card).transpose(0, 2, 1, 3)
        return logits  # [B, dep_q, T, card]

    # -------------------------------------------------------------- generation
    def depformer_step(self, params: dict, rng: jax.Array, text_token: jax.Array,
                       h: jax.Array, *, use_sampling: bool = True,
                       temp: float = 0.8, top_k: int = 250,
                       cfg_coef: float = 1.0) -> jax.Array:
        """Sample the dep_q audio codebooks for one frame (lm.py:809-850).

        text_token: [B] sampled text token; h: [B_model, 1, dim] temporal
        transformer output for this frame (B_model = 2B under CFG).
        Returns [B, dep_q] int32.  Runs as a lax.scan over codebook index with
        stacked per-step weights — a single XLA program.
        """
        c = self.config
        B = text_token.shape[0]
        B_model = h.shape[0]
        assert B_model == (2 * B if cfg_coef != 1.0 else B)
        dd = c.depformer_dim

        win = params["depformer_in"]["weight"]
        idx = c.depformer_in_index(jnp.arange(c.dep_q))
        win = take0(win, idx).astype(h.dtype)  # [dep_q, dim, dd]
        tr_in = einsum("bd,kde->kbe", h[:, 0], win)  # [dep_q, B_model, dd]

        dep_state = self.depformer.init_state(B_model, dtype=h.dtype)
        first_emb = embed(params["depformer_text_emb"], text_token, h.dtype)  # [B, dd]

        demb_w = params["depformer_emb"]["weight"]  # [dep_q-1, card+1, dd]
        demb_lr = params["depformer_emb"].get("low_rank")

        def body(carry, k):
            prev_emb, dep_state, rng = carry
            rng, krng = jax.random.split(rng)
            pe = prev_emb
            if cfg_coef != 1.0:
                pe = jnp.tile(pe, (2, 1))
            x = (tr_in[k] + pe)[:, None]  # [B_model, 1, dd]
            y, dep_state = self.depformer.step(params["depformer"], dep_state, x,
                                               steps=k[None])
            logits = wdot(y[:, 0], params["linears"]["weight"][k])
            if cfg_coef != 1.0:
                cond, uncond = jnp.split(logits, 2, axis=0)
                logits = uncond + (cond - uncond) * cfg_coef
            token = sample_token(krng, logits, use_sampling=use_sampling,
                                 temp=temp, top_k=top_k)
            table = {"weight": demb_w[jnp.clip(k, 0, c.dep_q - 2)]}
            if demb_lr is not None:
                table["low_rank"] = demb_lr[jnp.clip(k, 0, c.dep_q - 2)]
            next_emb = embed(table, token, h.dtype)
            return (next_emb, dep_state, rng), token

        ks = jnp.arange(c.dep_q, dtype=jnp.int32)
        _, tokens = lax.scan(body, (first_emb, dep_state, rng), ks)
        return tokens.T  # [B, dep_q]

    # ------------------------------------------------------------------ helpers
    def _initial_token(self, B: int) -> jax.Array:
        """[B, K] initial tokens: text_card for text, card for audio (lm.py:306-320)."""
        c = self.config
        text = jnp.full((B, 1), c.text_initial_token_id, jnp.int32)
        audio = jnp.full((B, c.n_q), c.initial_token_id, jnp.int32)
        return jnp.concatenate([text, audio], axis=1)

    def extra_head_probs(self, params: dict, h: jax.Array) -> jax.Array | None:
        if "extra_heads" not in params:
            return None
        logits = einsum("btd,ndo->nbto", h, params["extra_heads"]["weight"].astype(h.dtype))
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def _f32_tree(tree):
    return jax.tree.map(lambda x: x.astype(jnp.float32), tree)


def cross_entropy(logits: jax.Array, targets: jax.Array, mask: jax.Array
                  ) -> jax.Array:
    """Per-codebook masked CE in f32 (utils/utils.py:7-52 in the reference)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    ll = jnp.where(mask, ll, 0.0)
    return -jnp.sum(ll) / jnp.maximum(jnp.sum(mask), 1)
