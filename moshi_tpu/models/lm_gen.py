"""Streaming frame-by-frame generation for the Moshi LM.

Behavioral reference: `moshi/moshi/models/lm.py` (`LMGen`, 522-851):
- state is a circular delay-line cache `[B, K, max_delay+2]` of token ids plus
  per-item offsets (605-666);
- `_step` (669-783): scatter the user's input-audio tokens at
  `offset + delay`, gather model inputs at `offset` (initial tokens while
  `offset <= delay`), optional CFG batch doubling (incl. the masked-prefix and
  no-text null variants, 713-724), temporal forward, text sampling, depformer,
  scatter outputs, gather the undelayed output frame — invalid for the first
  `max_delay` steps;
- default sampling params (557-565): temp 0.8 / temp_text 0.7, top_k 250 /
  top_k_text 25; `padding_bonus` boosts the text pad logit (tts.py:553-555).

TPU-native: the whole step (sampling and depformer scan included) is one pure
function of (params, state, inputs) — jit once, zero per-step host sync.
Invalid frames are filled with `UNGENERATED_TOKEN` instead of returning None
(callers test `(out < 0).any()`), keeping shapes static.  Host-side control
planes (TTS/ASR state machines, reference hooks at lm.py:568-570) use the
split `main_step` (through text sampling) / `depth_step` (depformer + cache
commit) API, with audio forcing passed as data (`audio_zero_mask`,
`forced_audio`) rather than callbacks so each half stays a single jitted
program.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .lm import LMModel, UNGENERATED_TOKEN, ZERO_TOKEN
from ..utils.sampling import sample_token


@dataclass(frozen=True)
class LMGenConfig:
    use_sampling: bool = True
    temp: float = 0.8
    temp_text: float = 0.7
    top_k: int = 250
    top_k_text: int = 25
    cfg_coef: float = 1.0
    cfg_is_no_text: bool = False
    cfg_is_masked_until: bool = False  # enable the masked-prefix CFG null variant
    # Additive boost on the text pad logit.  Equivalent to the reference's
    # `pad_mult` (multiplying the pad probability by exp(m) before sampling,
    # rust lm_generate_multistream.rs:250-254) and to the TTS padding_bonus
    # (tts.py:553-555).
    padding_bonus: float = 0.0
    # Text repetition penalty over the last `text_rep_context` non-pad tokens
    # (rust lm_generate_multistream.rs:141-183): logit >= 0 -> /penalty,
    # logit < 0 -> *penalty.  Disabled when context == 0 or penalty == 1.
    text_rep_penalty: float = 1.0
    text_rep_context: int = 0
    # NOTE: the reference's `support_out_of_sync` flag (lm.py:571,774) only
    # controls a host-side whole-batch None shortcut during the first
    # max_delay steps.  Here the per-item invalid masking in `_commit` is
    # always on (UNGENERATED_TOKEN fills), i.e. out-of-sync batches are
    # always supported — no flag needed.

    @property
    def rep_penalty_on(self) -> bool:
        return self.text_rep_context > 0 and self.text_rep_penalty != 1.0

    @classmethod
    def from_dict(cls, d: dict) -> "LMGenConfig":
        known = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in known})


class LMGen:
    def __init__(self, model: LMModel, gen_config: LMGenConfig = LMGenConfig()):
        self.model = model
        self.gc = gen_config
        c = model.config
        self.max_delay = c.max_delay
        self.delays = jnp.asarray(c.delays, jnp.int32)
        self.num_input_audio = c.num_codebooks - c.dep_q - 1

    @property
    def model_batch_mult(self) -> int:
        return 2 if self.gc.cfg_coef != 1.0 else 1

    def init_state(self, batch_size: int, rng: jax.Array,
                   dtype=jnp.bfloat16) -> dict:
        c = self.model.config
        CT = self.max_delay + 2
        state = {
            "cache": jnp.full((batch_size, c.num_codebooks, CT),
                              UNGENERATED_TOKEN, jnp.int32),
            "offsets": jnp.zeros((batch_size,), jnp.int32),
            "transformer": self.model.transformer.init_state(
                batch_size * self.model_batch_mult, dtype),
            "rng": rng,
        }
        if self.gc.rep_penalty_on:
            state["text_history"] = jnp.full(
                (batch_size, self.gc.text_rep_context), -1, jnp.int32)
            state["hist_pos"] = jnp.zeros((batch_size,), jnp.int32)
        return state

    def init_cross_state(self, state: dict, params: dict, cross_src: jax.Array) -> dict:
        """Precompute cross-attention K/V from conditioning source [B_model, Ts, dim]."""
        cross = self.model.transformer.precompute_cross(
            params["transformer"], cross_src)
        tr = dict(state["transformer"])
        tr.update(cross)
        new = dict(state)
        new["transformer"] = tr
        return new

    # ---------------------------------------------------------------- pieces
    def _scatter_inputs(self, cache, offsets, input_tokens, exec_mask):
        """Write the user's audio-stream tokens at offset + delay and gather
        this frame's model inputs at offset (lm.py:693-711)."""
        model = self.model
        c = model.config
        B = cache.shape[0]
        CT = cache.shape[2]
        barange = jnp.arange(B)
        input_tokens = input_tokens[:, :self.num_input_audio]

        if self.num_input_audio > 0:
            in_delays = self.delays[c.dep_q + 1:]
            wpos = (offsets[:, None] + in_delays[None, :]) % CT
            kin = jnp.arange(c.dep_q + 1, c.num_codebooks)
            upd = jnp.where(exec_mask[:, None], input_tokens[:, :, 0],
                            cache[barange[:, None], kin[None, :], wpos])
            cache = cache.at[barange[:, None], kin[None, :], wpos].set(upd)

        is_init = (offsets[:, None] <= self.delays[None, :]) | ~exec_mask[:, None]
        rpos = (offsets % CT)[:, None]
        gathered = jnp.take_along_axis(
            cache, rpos[:, None, :].repeat(c.num_codebooks, 1), axis=2)[..., 0]
        input_ = jnp.where(is_init, model._initial_token(B), gathered)
        return cache, input_, is_init

    def _cfg_double(self, input_, is_init, offsets, cfg_masked_until):
        """CFG batch doubling with null variants (lm.py:713-724)."""
        gc = self.gc
        B = input_.shape[0]
        zero = jnp.full((), ZERO_TOKEN, jnp.int32)
        if gc.cfg_coef == 1.0:
            return input_
        if gc.cfg_is_masked_until and cfg_masked_until is not None:
            limit = self.delays[None, :] + cfg_masked_until[:, None]
            is_zeroed = offsets[:, None] <= limit
            null = jnp.where(is_zeroed & ~is_init, zero, input_)
        else:
            null = input_
        if gc.cfg_is_no_text:
            null = null.at[:, 0].set(jnp.where(~is_init[:, 0], zero, null[:, 0]))
        return jnp.concatenate([input_, null], axis=0)

    def _combine_cfg(self, logits):
        gc = self.gc
        if gc.cfg_coef == 1.0:
            return logits
        cond, uncond = jnp.split(logits, 2, axis=0)
        if gc.cfg_is_no_text:
            return cond
        return uncond + (cond - uncond) * gc.cfg_coef

    def _commit(self, cache, offsets, text_token, audio_tokens, exec_mask):
        """Advance offsets, scatter generated tokens, gather the undelayed
        output frame (lm.py:759-783)."""
        c = self.model.config
        B, CT = cache.shape[0], cache.shape[2]
        barange = jnp.arange(B)
        offsets = jnp.where(exec_mask, offsets + 1, offsets)
        pos = (offsets % CT)[:, None]
        k0 = jnp.zeros((1,), jnp.int32)
        cache = cache.at[barange[:, None], k0, pos].set(
            jnp.where(exec_mask[:, None], text_token[:, None],
                      cache[barange[:, None], k0, pos]))
        if audio_tokens is not None:
            kgen = jnp.arange(1, c.dep_q + 1)
            old = cache[barange[:, None], kgen[None, :], pos]
            cache = cache.at[barange[:, None], kgen[None, :], pos].set(
                jnp.where(exec_mask[:, None], audio_tokens, old))
        gen_delays = self.delays[: c.dep_q + 1]
        gpos = (offsets[:, None] - self.max_delay + gen_delays[None, :]) % CT
        out = cache[barange[:, None], jnp.arange(c.dep_q + 1)[None, :], gpos]
        invalid = (offsets <= self.max_delay) | ~exec_mask
        out = jnp.where(invalid[:, None], UNGENERATED_TOKEN, out)
        return cache, offsets, out[:, :, None]

    def _sample_text(self, rng, text_logits, text_history=None):
        gc = self.gc
        logits = text_logits[:, 0, 0].astype(jnp.float32)
        if gc.padding_bonus:
            pad = self.model.config.existing_text_padding_id
            logits = logits.at[:, pad].add(gc.padding_bonus)
        if text_history is not None:
            B, V = logits.shape
            idx = jnp.clip(text_history, 0, V - 1)
            seen = jnp.zeros((B, V), bool).at[
                jnp.arange(B)[:, None], idx].set(text_history >= 0)
            p = gc.text_rep_penalty
            logits = jnp.where(seen,
                               jnp.where(logits >= 0, logits / p, logits * p),
                               logits)
        return sample_token(rng, logits, use_sampling=gc.use_sampling,
                            temp=gc.temp_text, top_k=gc.top_k_text)

    def _update_history(self, state_updates: dict, state: dict,
                        text_token: jax.Array, exec_mask: jax.Array):
        """Push non-pad/eop/start tokens into the repetition-penalty ring."""
        if not self.gc.rep_penalty_on:
            return
        c = self.model.config
        hist, pos = state["text_history"], state["hist_pos"]
        N = hist.shape[1]
        skip = ((text_token == c.existing_text_padding_id)
                | (text_token == c.existing_text_end_padding_id)
                | (text_token == c.text_initial_token_id)
                | ~exec_mask)
        B = hist.shape[0]
        new_hist = hist.at[jnp.arange(B), pos % N].set(
            jnp.where(skip, hist[jnp.arange(B), pos % N], text_token))
        state_updates["text_history"] = new_hist
        state_updates["hist_pos"] = jnp.where(skip, pos, pos + 1)

    # ------------------------------------------------------------------- step
    def step(self, params: dict, state: dict, input_tokens: jax.Array,
             exec_mask: jax.Array | None = None,
             condition_sum: jax.Array | None = None,
             depformer_replace_tokens: jax.Array | None = None,
             cfg_masked_until: jax.Array | None = None,
             ) -> tuple[jax.Array, dict]:
        """One 80 ms frame, fully fused.  input_tokens: [B, Ki, 1] int.
        Returns (out [B, 1+dep_q, 1] int32, new state); `out` contains
        UNGENERATED_TOKEN for the first `max_delay` frames / frozen slots."""
        out, _, _, _, state = self._step(params, state, input_tokens, exec_mask,
                                         condition_sum, depformer_replace_tokens,
                                         cfg_masked_until)
        return out, state

    def step_with_text_prob(self, params, state, input_tokens,
                            exec_mask=None, condition_sum=None):
        """Also return the sampled text token's softmax probability [B] f32
        — the confidence that drives ColoredText (MT 7) frames
        (protocol.rs:30-53; the web client maps it onto an 11-level
        diverging palette, client TextDisplay.tsx)."""
        out, _, _, prob, state = self._step(params, state, input_tokens,
                                            exec_mask, condition_sum, None,
                                            None)
        return out, prob, state

    def step_with_extra_heads(self, params, state, input_tokens,
                              exec_mask=None, condition_sum=None):
        """Also return extra-head probabilities (lm.py:793-807)."""
        out, h, _, _, state = self._step(params, state, input_tokens, exec_mask,
                                         condition_sum, None, None)
        probs = self.model.extra_head_probs(params, h)
        return out, probs, state

    def _step(self, params, state, input_tokens, exec_mask, condition_sum,
              depformer_replace_tokens, cfg_masked_until):
        model = self.model
        gc = self.gc
        B = input_tokens.shape[0]
        assert input_tokens.shape[2] == 1, "steps are given one frame at a time"
        if exec_mask is None:
            exec_mask = jnp.ones((B,), bool)

        cache, offsets = state["cache"], state["offsets"]
        cache, input_, is_init = self._scatter_inputs(cache, offsets,
                                                      input_tokens, exec_mask)
        model_in = self._cfg_double(input_, is_init, offsets, cfg_masked_until)
        model_exec = jnp.tile(exec_mask, self.model_batch_mult)

        h, text_logits, tr_state = model.forward_text_step(
            params, state["transformer"], model_in[:, :, None],
            sum_condition=condition_sum, exec_mask=model_exec)
        text_logits = self._combine_cfg(text_logits)

        rng = state["rng"]
        rng, krng = jax.random.split(rng)
        text_token = self._sample_text(krng, text_logits, state.get("text_history"))
        # confidence of the sampled token (drives ColoredText frames)
        lp = jax.nn.log_softmax(text_logits[:, 0, 0].astype(jnp.float32), -1)
        text_prob = jnp.exp(jnp.take_along_axis(
            lp, text_token.reshape(B, 1), axis=-1))[:, 0]

        if depformer_replace_tokens is not None:
            audio_tokens = depformer_replace_tokens[:, :, 0]
        elif model.depformer is not None:
            rng, krng = jax.random.split(rng)
            audio_tokens = model.depformer_step(
                params, krng, text_token, h, use_sampling=gc.use_sampling,
                temp=gc.temp, top_k=gc.top_k, cfg_coef=gc.cfg_coef)
        else:
            audio_tokens = None

        cache, offsets, out = self._commit(cache, offsets, text_token,
                                           audio_tokens, exec_mask)
        new_state = dict(state)
        new_state.update(cache=cache, offsets=offsets, transformer=tr_state, rng=rng)
        self._update_history(new_state, state, text_token, exec_mask)
        return out, h[:B], text_token, text_prob, new_state

    # ------------------------------------------------------------- validation
    def check_frame(self, out: jax.Array) -> None:
        """Debug validation of an output frame (reference `check=True`,
        lm.py:704-711): no ungenerated markers once past the delay, and all
        token ids within vocabulary bounds.  Host-side; call on fetched
        frames when debugging."""
        import numpy as np
        c = self.model.config
        arr = np.asarray(out)
        if (arr == UNGENERATED_TOKEN).all():
            return  # pre-delay frame
        assert not (arr == UNGENERATED_TOKEN).any(), "partial ungenerated frame"
        assert (arr[:, 0] <= c.text_card).all(), "text token out of range"
        assert (arr[:, 1:] <= c.card).all(), "audio token out of range"
        assert (arr >= 0).all(), "negative token id"

    # -------------------------------------------------------- split-step API
    def main_step(self, params, state, input_tokens, exec_mask=None,
                  condition_sum=None, cfg_masked_until=None):
        """First half of a frame, through text sampling — for host-side
        control planes (TTS/ASR) that rewrite the text token before the
        depformer.  Returns (text_token [B], text_logits, h, state')."""
        model = self.model
        B = input_tokens.shape[0]
        if exec_mask is None:
            exec_mask = jnp.ones((B,), bool)
        cache, offsets = state["cache"], state["offsets"]
        cache, input_, is_init = self._scatter_inputs(cache, offsets,
                                                      input_tokens, exec_mask)
        model_in = self._cfg_double(input_, is_init, offsets, cfg_masked_until)
        model_exec = jnp.tile(exec_mask, self.model_batch_mult)

        h, text_logits, tr_state = model.forward_text_step(
            params, state["transformer"], model_in[:, :, None],
            sum_condition=condition_sum, exec_mask=model_exec)
        text_logits = self._combine_cfg(text_logits)
        rng = state["rng"]
        rng, krng = jax.random.split(rng)
        text_token = self._sample_text(krng, text_logits, state.get("text_history"))

        new_state = dict(state)
        new_state.update(cache=cache, transformer=tr_state, rng=rng)
        self._update_history(new_state, state, text_token, exec_mask)
        return text_token, text_logits, h, new_state

    def depth_step(self, params, state, text_token, h, exec_mask=None,
                   depformer_replace_tokens=None, audio_zero_mask=None,
                   forced_audio=None):
        """Second half of a frame: depformer sampling, audio forcing, cache
        commit.  `text_token` [B] may have been rewritten by the host.

        audio_zero_mask: optional [dep_q] (or per-slot [B, dep_q]) bool —
        codebooks to force to the zero token (TTS pre-delay zeroing,
        tts.py:557-564; 2-D for batched TTS where slots are at different
        offsets).
        forced_audio: optional [B, dep_q] int — values != UNGENERATED override
        the sampled tokens (TTS audio prefix forcing, tts.py:565-570).
        """
        model = self.model
        gc = self.gc
        B = text_token.shape[0]
        if exec_mask is None:
            exec_mask = jnp.ones((B,), bool)
        cache, offsets, rng = state["cache"], state["offsets"], state["rng"]

        if depformer_replace_tokens is not None:
            audio_tokens = depformer_replace_tokens[:, :, 0]
        else:
            rng, krng = jax.random.split(rng)
            audio_tokens = model.depformer_step(
                params, krng, text_token, h, use_sampling=gc.use_sampling,
                temp=gc.temp, top_k=gc.top_k, cfg_coef=gc.cfg_coef)
        if audio_zero_mask is not None:
            zm = (audio_zero_mask if audio_zero_mask.ndim == 2
                  else audio_zero_mask[None, :])
            audio_tokens = jnp.where(zm,
                                     jnp.full((), ZERO_TOKEN, jnp.int32),
                                     audio_tokens)
        if forced_audio is not None:
            audio_tokens = jnp.where(forced_audio != UNGENERATED_TOKEN,
                                     forced_audio, audio_tokens)

        cache, offsets, out = self._commit(cache, offsets, text_token,
                                           audio_tokens, exec_mask)
        new_state = dict(state)
        new_state.update(cache=cache, offsets=offsets, rng=rng)
        return out, new_state
