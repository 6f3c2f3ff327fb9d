"""Streaming frame-by-frame generation for the Moshi LM.

Behavioral reference: `moshi/moshi/models/lm.py` (`LMGen`, 522-851):
- state is a circular delay-line cache `[B, K, max_delay+2]` of token ids plus
  per-item offsets (605-666);
- `_step` (669-783): scatter the user's input-audio tokens at
  `offset + delay`, gather model inputs at `offset` (initial tokens while
  `offset <= delay`), optional CFG batch doubling, temporal forward, text
  sampling, 8 sequential depformer steps, scatter outputs, gather the
  undelayed output frame — which is invalid for the first `max_delay` steps;
- default sampling params (557-565): temp 0.8 / temp_text 0.7, top_k 250 /
  top_k_text 25.

TPU-native: the whole step (including sampling and the depformer scan) is one
pure function of (params, state, inputs, rng) — jit once, no per-step host
sync.  Instead of returning None for the first `max_delay` frames, invalid
frames are filled with `UNGENERATED_TOKEN` (callers test `(out < 0).any()`),
keeping shapes static.  Hooks (`on_text_hook` etc. in the reference,
lm.py:568-570) are supported as *pure in-graph callables*; host-side control
planes (the TTS/ASR state machines) use the split `main_step`/`depth_step`
API instead.
"""

from dataclasses import dataclass
from functools import partial

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
    support_out_of_sync: bool = False


class LMGen:
    def __init__(self, model: LMModel, gen_config: LMGenConfig = LMGenConfig(),
                 on_text_logits_hook=None, on_text_hook=None, on_audio_hook=None):
        self.model = model
        self.gc = gen_config
        self.on_text_logits_hook = on_text_logits_hook  # pure: logits -> logits
        self.on_text_hook = on_text_hook                # pure: token -> token
        self.on_audio_hook = on_audio_hook              # pure: tokens -> tokens
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
        return {
            "cache": jnp.full((batch_size, c.num_codebooks, CT),
                              UNGENERATED_TOKEN, jnp.int32),
            "offsets": jnp.zeros((batch_size,), jnp.int32),
            "transformer": self.model.transformer.init_state(
                batch_size * self.model_batch_mult, dtype),
            "rng": rng,
        }

    # ------------------------------------------------------------------- step
    def step(self, params: dict, state: dict, input_tokens: jax.Array,
             exec_mask: jax.Array | None = None,
             condition_sum: jax.Array | None = None,
             depformer_replace_tokens: jax.Array | None = None,
             ) -> tuple[jax.Array, dict]:
        """One 80 ms frame.  input_tokens: [B, Ki>=num_input_audio, 1] int.

        Returns (out [B, 1+dep_q, 1] int32, new state).  `out` contains
        UNGENERATED_TOKEN for the first `max_delay` frames / frozen slots.
        """
        out, _, _, state = self._step(params, state, input_tokens, exec_mask,
                                      condition_sum, depformer_replace_tokens)
        return out, state

    def step_with_extra_heads(self, params, state, input_tokens,
                              exec_mask=None, condition_sum=None):
        """Also returns the extra-head probabilities (ASR word boundaries),
        mirroring lm.py:793-807."""
        out, h, _, state = self._step(params, state, input_tokens, exec_mask,
                                      condition_sum, None)
        probs = self.model.extra_head_probs(params, h)
        return out, probs, state

    def _step(self, params, state, input_tokens, exec_mask, condition_sum,
              depformer_replace_tokens):
        model = self.model
        c = model.config
        gc = self.gc
        B, Ki, S = input_tokens.shape
        assert S == 1, "steps are given one frame at a time"
        assert Ki >= self.num_input_audio, (Ki, self.num_input_audio)
        input_tokens = input_tokens[:, :self.num_input_audio]
        if exec_mask is None:
            exec_mask = jnp.ones((B,), bool)

        cache, offsets = state["cache"], state["offsets"]
        CT = cache.shape[2]
        barange = jnp.arange(B)

        # 1. scatter the user-stream audio tokens at offset + delay (lm.py:693-696)
        in_delays = self.delays[c.dep_q + 1:]
        wpos = (offsets[:, None] + in_delays[None, :]) % CT  # [B, Kin]
        kin = jnp.arange(c.dep_q + 1, c.num_codebooks)
        upd = jnp.where(exec_mask[:, None], input_tokens[:, :, 0],
                        cache[barange[:, None], kin[None, :], wpos])
        cache = cache.at[barange[:, None], kin[None, :], wpos].set(upd)

        # 2. gather this frame's model inputs at offset (lm.py:698-702)
        is_init = offsets[:, None] <= self.delays[None, :]          # [B, K]
        is_init |= ~exec_mask[:, None]
        rpos = (offsets % CT)[:, None]
        gathered = jnp.take_along_axis(cache, rpos[:, None, :].repeat(c.num_codebooks, 1), axis=2)[..., 0]
        initial = model._initial_token(B)
        input_ = jnp.where(is_init, initial, gathered)              # [B, K]

        # 3. CFG batch doubling (lm.py:713-724)
        model_in = input_
        if gc.cfg_coef != 1.0:
            null = input_
            if gc.cfg_is_no_text:
                zero = jnp.full((), ZERO_TOKEN, jnp.int32)
                null = null.at[:, 0].set(jnp.where(~is_init[:, 0], zero, null[:, 0]))
            model_in = jnp.concatenate([input_, null], axis=0)
        model_exec = exec_mask
        if gc.cfg_coef != 1.0:
            model_exec = jnp.tile(exec_mask, 2)

        # 4. temporal transformer + text head
        h, text_logits, tr_state = model.forward_text_step(
            params, state["transformer"], model_in[:, :, None],
            sum_condition=condition_sum, exec_mask=model_exec)
        if gc.cfg_coef != 1.0:
            cond, uncond = jnp.split(text_logits, 2, axis=0)
            text_logits = cond if gc.cfg_is_no_text else \
                uncond + (cond - uncond) * gc.cfg_coef
        if self.on_text_logits_hook is not None:
            text_logits = self.on_text_logits_hook(text_logits)

        rng = state["rng"]
        rng, krng = jax.random.split(rng)
        text_token = sample_token(krng, text_logits[:, 0, 0],
                                  use_sampling=gc.use_sampling,
                                  temp=gc.temp_text, top_k=gc.top_k_text)  # [B]
        if self.on_text_hook is not None:
            text_token = self.on_text_hook(text_token)

        # 5. depformer (lm.py:748-757)
        if depformer_replace_tokens is not None:
            audio_tokens = depformer_replace_tokens[:, :, 0]
        elif model.depformer is not None:
            rng, krng = jax.random.split(rng)
            audio_tokens = model.depformer_step(
                params, krng, text_token, h, use_sampling=gc.use_sampling,
                temp=gc.temp, top_k=gc.top_k, cfg_coef=gc.cfg_coef)
        else:
            audio_tokens = None
        if audio_tokens is not None and self.on_audio_hook is not None:
            audio_tokens = self.on_audio_hook(audio_tokens)

        # 6. advance offsets; scatter the generated tokens (lm.py:759-772)
        offsets = jnp.where(exec_mask, offsets + 1, offsets)
        pos = (offsets % CT)[:, None]
        cache = cache.at[barange[:, None], jnp.zeros((1,), jnp.int32), pos].set(
            jnp.where(exec_mask[:, None], text_token[:, None],
                      cache[barange[:, None], jnp.zeros((1,), jnp.int32), pos]))
        if audio_tokens is not None:
            kgen = jnp.arange(1, c.dep_q + 1)
            old = cache[barange[:, None], kgen[None, :], pos]
            cache = cache.at[barange[:, None], kgen[None, :], pos].set(
                jnp.where(exec_mask[:, None], audio_tokens, old))

        # 7. gather the undelayed output frame (lm.py:774-783)
        gen_delays = self.delays[: c.dep_q + 1]
        gpos = (offsets[:, None] - self.max_delay + gen_delays[None, :]) % CT
        out = cache[barange[:, None], jnp.arange(c.dep_q + 1)[None, :], gpos]
        invalid = (offsets <= self.max_delay) | ~exec_mask
        out = jnp.where(invalid[:, None], UNGENERATED_TOKEN, out)

        new_state = dict(state)
        new_state.update(cache=cache, offsets=offsets, transformer=tr_state, rng=rng)
        return out[:, :, None], h[: B], text_token, new_state

    # -------------------------------------------------------- split-step API
    def main_step(self, params, state, input_tokens, exec_mask=None,
                  condition_sum=None):
        """First half of a frame, up to the text logits — for host-side control
        planes (TTS/ASR state machines) that must inspect/rewrite the text
        token before the depformer runs.  Returns (text_logits, h, state')."""
        model = self.model
        c = model.config
        gc = self.gc
        B = input_tokens.shape[0]
        if exec_mask is None:
            exec_mask = jnp.ones((B,), bool)
        cache, offsets = state["cache"], state["offsets"]
        CT = cache.shape[2]
        barange = jnp.arange(B)
        input_tokens = input_tokens[:, :self.num_input_audio]

        in_delays = self.delays[c.dep_q + 1:]
        wpos = (offsets[:, None] + in_delays[None, :]) % CT
        kin = jnp.arange(c.dep_q + 1, c.num_codebooks)
        upd = jnp.where(exec_mask[:, None], input_tokens[:, :, 0],
                        cache[barange[:, None], kin[None, :], wpos])
        cache = cache.at[barange[:, None], kin[None, :], wpos].set(upd)

        is_init = (offsets[:, None] <= self.delays[None, :]) | ~exec_mask[:, None]
        rpos = (offsets % CT)[:, None]
        gathered = jnp.take_along_axis(cache, rpos[:, None, :].repeat(c.num_codebooks, 1), axis=2)[..., 0]
        input_ = jnp.where(is_init, model._initial_token(B), gathered)

        model_in = input_
        model_exec = exec_mask
        if gc.cfg_coef != 1.0:
            model_in = jnp.concatenate([input_, input_], axis=0)
            model_exec = jnp.tile(exec_mask, 2)

        h, text_logits, tr_state = model.forward_text_step(
            params, state["transformer"], model_in[:, :, None],
            sum_condition=condition_sum, exec_mask=model_exec)
        if gc.cfg_coef != 1.0:
            cond, uncond = jnp.split(text_logits, 2, axis=0)
            text_logits = uncond + (cond - uncond) * gc.cfg_coef

        new_state = dict(state)
        new_state.update(cache=cache, transformer=tr_state)
        return text_logits, h, new_state

    def depth_step(self, params, state, text_token, h, exec_mask=None,
                   depformer_replace_tokens=None):
        """Second half of a frame: depformer sampling + cache bookkeeping.
        `text_token` [B] may have been rewritten by a host-side state machine.
        Returns (out [B, 1+dep_q, 1], state')."""
        model = self.model
        c = model.config
        gc = self.gc
        B = text_token.shape[0]
        if exec_mask is None:
            exec_mask = jnp.ones((B,), bool)
        cache, offsets = state["cache"], state["offsets"]
        CT = cache.shape[2]
        barange = jnp.arange(B)
        rng = state["rng"]

        if depformer_replace_tokens is not None:
            audio_tokens = depformer_replace_tokens[:, :, 0]
        else:
            rng, krng = jax.random.split(rng)
            audio_tokens = model.depformer_step(
                params, krng, text_token, h, use_sampling=gc.use_sampling,
                temp=gc.temp, top_k=gc.top_k, cfg_coef=gc.cfg_coef)

        offsets = jnp.where(exec_mask, offsets + 1, offsets)
        pos = (offsets % CT)[:, None]
        cache = cache.at[barange[:, None], jnp.zeros((1,), jnp.int32), pos].set(
            jnp.where(exec_mask[:, None], text_token[:, None],
                      cache[barange[:, None], jnp.zeros((1,), jnp.int32), pos]))
        kgen = jnp.arange(1, c.dep_q + 1)
        old = cache[barange[:, None], kgen[None, :], pos]
        cache = cache.at[barange[:, None], kgen[None, :], pos].set(
            jnp.where(exec_mask[:, None], audio_tokens, old))

        gen_delays = self.delays[: c.dep_q + 1]
        gpos = (offsets[:, None] - self.max_delay + gen_delays[None, :]) % CT
        out = cache[barange[:, None], jnp.arange(c.dep_q + 1)[None, :], gpos]
        invalid = (offsets <= self.max_delay) | ~exec_mask
        out = jnp.where(invalid[:, None], UNGENERATED_TOKEN, out)

        new_state = dict(state)
        new_state.update(cache=cache, offsets=offsets, rng=rng)
        return out[:, :, None], new_state
