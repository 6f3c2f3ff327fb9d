"""Streaming speech-to-text (ASR/STT) engine with word-level timestamps.

Behavioral reference: `rust/moshi-core/src/asr.rs` (State/ItemState, 15-264):
- per-item 1-step delayed audio feeding via `next_token` (44-52: returns the
  previous frame's token, pad on the first step);
- text token fed back each step (text start token on the first step);
- after `asr_delay_in_tokens` steps: pad(3)/epad(0) flush the accumulated
  word as `Word{tokens, start_time}`; epad also emits
  `EndWord{stop_time = (step - delay)/12.5}` (242-249);
- extra-head probabilities emitted as `Step` messages (195-207);
- per-slot reset for batched serving (256-264);
- continuous `delay` conditioning: real kyutai STT checkpoints carry a
  ContinuousAttribute conditioner and the server feeds
  `condition_cont("delay", -conditioning_delay)` (an AddToInput vector) into
  every temporal step (`moshi-server/src/asr.rs:55-67`, batched variant
  `batched_asr.rs:190-213` which alternatively uses the learnt padding).

The device work per 80 ms frame is one jitted temporal-transformer step +
argmax/sample; the word state machine runs on host (it produces strings).
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .lm import LMModel
from .mimi import MimiModel
from ..utils.sampling import sample_token


@dataclass
class AsrWord:
    tokens: list
    start_time: float
    batch_idx: int
    text: str | None = None


@dataclass
class AsrEndWord:
    stop_time: float
    batch_idx: int


@dataclass
class AsrStep:
    step_idx: int
    prs: np.ndarray  # [num_extra_heads, B]


@dataclass
class _ItemState:
    audio_pad_token: int
    n_codebooks: int
    step_idx: int = 0
    text_token: int = 0
    word_tokens: list = field(default_factory=list)
    unended_word: bool = False
    last_stop_time: float = 0.0
    next_codebooks: np.ndarray = None

    def __post_init__(self):
        self.reset()

    def reset(self):
        self.step_idx = 0
        self.text_token = 0
        self.word_tokens = []
        self.unended_word = False
        self.last_stop_time = 0.0
        self.next_codebooks = np.full((self.n_codebooks,), self.audio_pad_token,
                                      np.int32)

    def next_token(self, tokens: np.ndarray) -> np.ndarray:
        prev = self.next_codebooks.copy()
        self.next_codebooks = tokens.astype(np.int32)
        if self.step_idx == 0:
            return np.full_like(prev, self.audio_pad_token)
        return prev


def asr_sum_condition(info, dim: int, conditioning_delay: float | None = None,
                      learnt_padding: bool = False):
    """Build the per-step AddToInput condition for an ASR checkpoint.

    Mirrors the reference server exactly: a checkpoint whose model config has
    a condition provider REQUIRES either `conditioning_delay` (the value fed
    as `condition_cont("delay", -delay)`, `moshi-server/src/asr.rs:55-67`) or
    `conditioning_learnt_padding` (the conditioner's learnt padding vector,
    `batched_asr.rs:197-213`) — and rejects both at once.  Returns a
    [1, 1, dim] array, or None when the checkpoint has no `delay` conditioner
    and no conditioning was requested."""
    provider, _, cp_params = info.get_conditioners(dim)
    has_delay = provider is not None and "delay" in provider.conditioners
    if not has_delay:
        if conditioning_delay is not None or learnt_padding:
            raise ValueError("conditioning requested but the checkpoint has "
                             "no 'delay' conditioner")
        return None
    if conditioning_delay is not None and learnt_padding:
        raise ValueError("conditioning_delay/conditioning_learnt_padding "
                         "cannot be both set")  # batched_asr.rs:209
    if learnt_padding:
        return jnp.asarray(cp_params["delay"]["learnt_padding"],
                           jnp.float32).reshape(1, 1, dim)
    if conditioning_delay is None:
        raise ValueError("missing conditioning_delay in config")  # asr.rs:57
    cond = provider.conditioners["delay"]
    prepared = cond.prepare([-float(conditioning_delay)])
    out, _ = cond.apply(cp_params["delay"], prepared)
    return out  # [1, 1, dim]


class StreamingASR:
    def __init__(self, mimi: MimiModel, lm: LMModel, batch_size: int,
                 asr_delay_in_tokens: int, temperature: float = 0.0,
                 text_tokenizer=None, frame_rate: float = 12.5,
                 mimi_dtype=jnp.float32, sum_condition=None,
                 mimi_chunks: int = 1):
        # mimi_dtype=bf16 is the batched-serving codec knob (BENCH_BATCH.md):
        # callers must pass mimi params cast to the same dtype.
        self.mimi_dtype = jnp.dtype(mimi_dtype)
        # mimi_chunks > 1 splits the Mimi encoder state/compute into that
        # many independent batch chunks stepped sequentially.  At very large
        # batch the encoder's activation temps (~10 MB/slot) otherwise peak
        # NEXT TO the resident LM KV cache and push XLA into involuntary
        # rematerialization — the measured B=512 int4-KV cliff (60 -> 207 ms,
        # BENCH_TTS_ASR.md; byte accounting: scripts/asr_hbm_audit.py).
        # Chunking bounds the encode working set without any gather/scatter:
        # each chunk is a separate state tree, so no copies are paid.
        if batch_size % mimi_chunks != 0:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"mimi_chunks {mimi_chunks}")
        self.mimi_chunks = mimi_chunks
        self._mimi_bc = batch_size // mimi_chunks
        # [1, 1, dim] AddToInput condition applied every temporal step
        # (asr.rs:55-67); None for unconditioned checkpoints.
        self.sum_condition = (None if sum_condition is None
                              else jnp.asarray(sum_condition))
        self.mimi = mimi
        self.lm = lm
        self.batch_size = batch_size
        self.asr_delay_in_tokens = asr_delay_in_tokens
        self.temperature = temperature
        self.text_tokenizer = text_tokenizer
        self.frame_rate = frame_rate
        c = lm.config
        self.audio_pad_token = c.initial_token_id  # audio "start/pad" = card
        self.text_start_token = c.text_initial_token_id
        self.n_codebooks = c.n_q
        self.items = [_ItemState(self.audio_pad_token, self.n_codebooks)
                      for _ in range(batch_size)]
        self.model_step_idx = 0
        self._step_fn = jax.jit(self._device_step, donate_argnums=1)
        self._encode_fn = jax.jit(self.mimi.encode_step, donate_argnums=1)
        self._reset_fn = jax.jit(self._masked_reset, donate_argnums=0)
        # exact per-leaf batch axes: the shape heuristic corrupts other
        # slots when B collides with a layer-stack dim (utils/trees.py)
        from ..utils.trees import (state_batch_axes, take_slots, put_slots)
        self._ax_mimi = state_batch_axes(
            lambda b: self.mimi.init_encode_state(b, self.mimi_dtype))
        self._ax_tr = state_batch_axes(
            lambda b: self.lm.transformer.init_state(b, jnp.bfloat16))
        # single-slot snapshot extract/restore (session resume).  Split per
        # sub-tree so the chunked-mimi layout can route the chunk on the
        # host (a traced slot index cannot select among chunk pytrees);
        # restores donate the live buffers (a host-side scatter would
        # materialize a second full state next to the live one).
        self._extract_tr = jax.jit(
            lambda tr, idx: take_slots(tr, idx, batch_size, self._ax_tr))
        self._restore_tr = jax.jit(
            lambda tr, v, idx: put_slots(tr, v, idx, batch_size, self._ax_tr),
            donate_argnums=0)
        self._extract_mimi = jax.jit(
            lambda mc, idx: take_slots(mc, idx, self._mimi_bc, self._ax_mimi))
        self._restore_mimi = jax.jit(
            lambda mc, v, idx: put_slots(mc, v, idx, self._mimi_bc,
                                         self._ax_mimi),
            donate_argnums=0)

    # ------------------------------------------------------------- device part
    def _device_step(self, lm_params, tr_state, tokens, rng, exec_mask):
        """tokens: [B, 1+n_q, 1].  One temporal step + text sampling."""
        h, text_logits, tr_state = self.lm.forward_text_step(
            lm_params, tr_state, tokens, sum_condition=self.sum_condition,
            exec_mask=exec_mask)
        if self.temperature <= 0.0:
            text_token = jnp.argmax(text_logits[:, 0, 0].astype(jnp.float32), axis=-1)
        else:
            rng, krng = jax.random.split(rng)
            text_token = sample_token(krng, text_logits[:, 0, 0], use_sampling=True,
                                      temp=self.temperature)
        probs = self.lm.extra_head_probs(lm_params, h)
        pr_first = None if probs is None else probs[:, :, 0, 0]  # [n_heads, B]
        return text_token.astype(jnp.int32), pr_first, tr_state, rng

    # --------------------------------------------------------------- state mgmt
    def init_state(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict:
        if self.mimi_chunks == 1:
            mimi = self.mimi.init_encode_state(self.batch_size,
                                               self.mimi_dtype)
        else:
            mimi = tuple(self.mimi.init_encode_state(self._mimi_bc,
                                                     self.mimi_dtype)
                         for _ in range(self.mimi_chunks))
        return {
            "mimi": mimi,
            "transformer": self.lm.transformer.init_state(self.batch_size, dtype),
            "rng": rng,
        }

    def reset_batch_idx(self, state: dict, batch_idx: int) -> dict:
        self.items[batch_idx].reset()
        mask = np.zeros((self.batch_size,), bool)
        mask[batch_idx] = True
        return self._reset_fn(state, jnp.asarray(mask))

    def _masked_reset(self, state: dict, mask: jax.Array) -> dict:
        """Jitted per-slot reset with state donation: a host-side masked
        reset materializes a complete fresh KV cache next to the live one
        and can OOM at max batch; inside jit the fresh init fuses into
        in-place selects on the donated buffers."""
        from ..utils.trees import masked_reset
        tr_init = self.lm.transformer.init_state(
            self.batch_size, state["transformer"]["k"].dtype)
        new = dict(state)
        if self.mimi_chunks == 1:
            mimi_init = self.mimi.init_encode_state(self.batch_size,
                                                    self.mimi_dtype)
            new["mimi"] = masked_reset(state["mimi"], mimi_init, mask,
                                       self._ax_mimi)
        else:
            bc = self._mimi_bc
            mimi_init = self.mimi.init_encode_state(bc, self.mimi_dtype)
            new["mimi"] = tuple(
                masked_reset(ch, mimi_init, mask[i * bc:(i + 1) * bc],
                             self._ax_mimi)
                for i, ch in enumerate(state["mimi"]))
        new["transformer"] = masked_reset(state["transformer"], tr_init,
                                          mask, self._ax_tr)
        return new

    # ---------------------------------------------------------------- stepping
    def step_pcm(self, mimi_params, lm_params, state: dict, pcm,
                 exec_mask=None) -> tuple[list, dict]:
        """pcm: [B, 1, n*frame_size] -> (messages, new state)."""
        state = dict(state)
        if self.mimi_chunks == 1:
            codes, state["mimi"] = self._encode_fn(
                mimi_params, state["mimi"],
                jnp.asarray(pcm, self.mimi_dtype), exec_mask)
        else:
            bc = self._mimi_bc
            pcm = np.asarray(pcm)
            em = None if exec_mask is None else np.asarray(exec_mask)
            outs, chunks = [], []
            for i, ch in enumerate(state["mimi"]):
                c, ns = self._encode_fn(
                    mimi_params, ch,
                    jnp.asarray(pcm[i * bc:(i + 1) * bc], self.mimi_dtype),
                    None if em is None
                    else jnp.asarray(em[i * bc:(i + 1) * bc]))
                outs.append(c)
                chunks.append(ns)
            state["mimi"] = tuple(chunks)
            codes = jnp.concatenate(outs, axis=0)
        msgs, state = self.step_tokens(lm_params, state, np.asarray(codes), exec_mask)
        return msgs, state

    # ------------------------------------------------- single-slot snapshots
    def extract_slot_arrays(self, state: dict, slot: int):
        """Device rows (mimi, transformer) for one slot — session resume.
        `slot` must be a host int: the chunked-mimi layout routes the chunk
        in python (a traced index cannot select among pytrees)."""
        slot = int(slot)
        idx = jnp.asarray([slot], jnp.int32)
        tr = self._extract_tr(state["transformer"], idx)
        if self.mimi_chunks == 1:
            m = self._extract_mimi(state["mimi"], idx)
        else:
            bc = self._mimi_bc
            m = self._extract_mimi(state["mimi"][slot // bc],
                                   jnp.asarray([slot % bc], jnp.int32))
        return (m, tr)

    def restore_slot_arrays(self, state: dict, arrays, slot: int) -> dict:
        """Inverse of extract_slot_arrays; donates the live buffers."""
        slot = int(slot)
        m, tr = arrays
        idx = jnp.asarray([slot], jnp.int32)
        new = dict(state)
        new["transformer"] = self._restore_tr(state["transformer"], tr, idx)
        if self.mimi_chunks == 1:
            new["mimi"] = self._restore_mimi(state["mimi"], m, idx)
        else:
            bc = self._mimi_bc
            chunks = list(state["mimi"])
            chunks[slot // bc] = self._restore_mimi(
                chunks[slot // bc], m, jnp.asarray([slot % bc], jnp.int32))
            new["mimi"] = tuple(chunks)
        return new

    def step_tokens(self, lm_params, state: dict, audio_tokens: np.ndarray,
                    exec_mask=None) -> tuple[list, dict]:
        """audio_tokens: [B, K, steps] int."""
        B, K, steps = audio_tokens.shape
        assert B == self.batch_size
        if exec_mask is None:
            exec_np = np.ones((B,), bool)
        else:
            exec_np = np.asarray(exec_mask)
        msgs: list = []
        tr_state, rng = state["transformer"], state["rng"]
        for s in range(steps):
            # assemble delayed inputs on host (asr.rs:167-190)
            audio_in = np.zeros((B, self.n_codebooks), np.int32)
            text_in = np.zeros((B,), np.int32)
            for b, item in enumerate(self.items):
                if not exec_np[b]:
                    audio_in[b] = 0
                    text_in[b] = self.text_start_token
                    continue
                toks = audio_tokens[b, :, s]
                if K < self.n_codebooks:
                    toks = np.concatenate([toks, np.full(
                        (self.n_codebooks - K,), self.audio_pad_token, np.int32)])
                audio_in[b] = item.next_token(toks[:self.n_codebooks])
                text_in[b] = (self.text_start_token if item.step_idx == 0
                              else item.text_token)
            tokens = np.concatenate([text_in[:, None], audio_in], axis=1)[:, :, None]

            text_token, pr_first, tr_state, rng = self._step_fn(
                lm_params, tr_state, jnp.asarray(tokens), rng,
                None if exec_mask is None else jnp.asarray(exec_np))
            self.model_step_idx += 1
            if pr_first is not None:
                msgs.append(AsrStep(self.model_step_idx, np.asarray(pr_first)))

            text_np = np.asarray(text_token)
            for b, item in enumerate(self.items):
                if not exec_np[b]:
                    continue
                item.text_token = int(text_np[b])
                item.step_idx += 1
                if item.step_idx >= self.asr_delay_in_tokens:
                    t = item.text_token
                    if t in (0, 3):
                        if item.word_tokens:
                            word = AsrWord(item.word_tokens, item.last_stop_time, b)
                            if self.text_tokenizer is not None:
                                word.text = self.text_tokenizer.decode(word.tokens)
                            msgs.append(word)
                            item.word_tokens = []
                            item.unended_word = True
                    else:
                        item.word_tokens.append(t)
                    if t == 0:
                        stop_time = (item.step_idx - self.asr_delay_in_tokens) / self.frame_rate
                        if item.unended_word:
                            item.unended_word = False
                            msgs.append(AsrEndWord(stop_time, b))
                        item.last_stop_time = stop_time
        new_state = dict(state)
        new_state.update(transformer=tr_state, rng=rng)
        return msgs, new_state
