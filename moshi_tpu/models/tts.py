"""Delayed Streams Modeling (DSM) text-to-speech engine.

Behavioral reference: `moshi/moshi/models/tts.py` —
- `TokenIds` (37-57), `Entry` (60-74), `State` (77-112);
- `StateMachine.process` (160-252): every step the model's sampled text token
  is rewritten — queued word tokens and padding budgets are force-fed, a
  sampled `new_word` pops the next entry, and with a lookahead second stream
  the two tokens are muxed as `(second + 1) * card + main`;
- `script_to_entries` (255-317) incl. SSML `<break time="Ns"/>`;
- `generate` (496-628): audio delayed by `delay_steps`; pre-delay frames skip
  the depformer entirely; per-codebook zeroing and audio-prefix forcing in
  the audio hook (553-570); `padding_bonus` on the text pad logit (553-555);
- voice conditioning via cross-attn speaker embeddings
  (`make_condition_attributes`, 639-683) or audio-prefix teacher forcing
  (`get_prefix`, 685-691); CFG null = dropped conditions (124-126).

TPU split: the temporal transformer + text sampling run as one jitted
`main_step`; the host state machine rewrites the text tokens; the depformer +
cache commit run as one jitted `depth_step` with audio forcing passed as
arrays.  One device round-trip per 80 ms frame, same as the reference's
hook boundary.
"""

import re
import typing as tp
from collections import deque
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .lm import LMModel, UNGENERATED_TOKEN, ZERO_TOKEN
from .lm_gen import LMGen, LMGenConfig
from .mimi import MimiModel
from ..conditioners import (ConditionAttributes, TensorCondition,
                            dropout_all_conditions)

DEFAULT_MAX_SPEAKERS = 5


@dataclass
class TokenIds:
    card: int
    new_word: int = 0
    pad: int = 3
    main: int = 1
    other: int = 2
    zero: int = ZERO_TOKEN
    ungenerated: int = UNGENERATED_TOKEN


@dataclass
class Entry:
    tokens: list[int]
    text: str
    padding: int = 0


@dataclass
class State:
    entries: deque
    remaining_padding: int
    forced_padding: int
    queued: deque = field(default_factory=deque)
    lookahead_queued: deque = field(default_factory=deque)
    end_step: int | None = None
    consumption_times: list = field(default_factory=list)
    transcript: list = field(default_factory=list)

    def get_tokens_ahead(self, lookahead: int) -> list[int]:
        assert lookahead > 0
        for entry in self.entries:
            if entry.tokens:
                lookahead -= 1
                if lookahead == 0:
                    return entry.tokens
        return []


@dataclass
class StateMachine:
    token_ids: TokenIds
    second_stream_ahead: int = 0
    max_padding: int = 6
    initial_padding: int = 2

    def new_state(self, entries: tp.Sequence[Entry]) -> State:
        return State(entries=deque(entries),
                     remaining_padding=self.initial_padding,
                     forced_padding=self.initial_padding)

    def process(self, step: int, state: State, token: int) -> tuple[int, bool]:
        """Rewrite the model's sampled text `token` into the actual next text
        input (tts.py:160-252).  Returns (output_token, consumed_new_word)."""
        ids = self.token_ids
        consumed_new_word = False
        if token not in (ids.new_word, ids.pad):
            token = ids.pad

        if state.queued:
            token = ids.pad
        elif state.forced_padding > 0:
            token = ids.pad
        elif state.remaining_padding <= 0:
            token = ids.new_word

        if token == ids.new_word:
            if state.entries:
                entry = state.entries.popleft()
                state.consumption_times.append(step)
                consumed_new_word = True
                if entry.tokens:
                    state.transcript.append((entry.text, step))
                    state.queued.extend(entry.tokens)
                    if self.second_stream_ahead:
                        state.lookahead_queued.extend(
                            state.get_tokens_ahead(self.second_stream_ahead))
                    state.remaining_padding = self.max_padding
                else:
                    token = ids.pad
                state.forced_padding = entry.padding
            else:
                token = ids.pad
                if self.second_stream_ahead and state.end_step is None:
                    token = ids.new_word
                if state.end_step is None:
                    state.end_step = step

        output: int | None = None
        if token == ids.pad:
            if state.remaining_padding > 0:
                state.remaining_padding -= 1
            if state.forced_padding > 0:
                state.forced_padding -= 1
            output = state.queued.popleft() if state.queued else ids.pad
        elif token == ids.new_word:
            output = ids.new_word
        else:
            raise RuntimeError(f"invalid token {token}")

        if self.second_stream_ahead:
            second = -1
            if output == ids.new_word:
                second = ids.new_word
                output = state.queued.popleft() if state.queued else ids.pad
            elif state.lookahead_queued:
                second = state.lookahead_queued.popleft()
            output = (second + 1) * ids.card + output

        assert output is not None
        return output, consumed_new_word


def script_to_entries(tokenizer, token_ids: TokenIds, frame_rate: float,
                      script: tp.Sequence[str], multi_speaker: bool = True,
                      padding_between: int = 0) -> list[Entry]:
    """Tokenize a script into word entries, handling speaker turns and SSML
    `<break time="Ns"/>` (tts.py:255-317)."""
    speaker_tokens = [token_ids.main, token_ids.other]
    last_speaker = None
    entries: list[Entry] = []
    event_re = re.compile(r"(?:<break\s+time=\"([0-9]+(?:.[0-9]*)?)s\"\s*/?>)|(?:\s+)")

    first_content = True

    def _add_entry(idx: int, word: str):
        nonlocal first_content, last_speaker
        assert " " not in word and word
        tokens = list(tokenizer.encode(word))
        if first_content:
            speaker = idx % len(speaker_tokens)
            if multi_speaker and last_speaker != speaker:
                last_speaker = speaker
                tokens.insert(0, speaker_tokens[speaker])
            first_content = False
        padding = 0
        if padding_between > 0:
            padding = max(0, padding_between + len(tokens) - 1)
        entries.append(Entry(tokens=tokens, text=word, padding=padding))

    from ..text.tts_preprocess import normalize
    for idx, line in enumerate(script):
        first_content = True
        line = normalize(line)
        while line:
            match = event_re.search(line)
            if match is None:
                break
            word = line[: match.start()]
            line = line[match.end():]
            if word:
                _add_entry(idx, word)
            if match.group(1):
                padding = int(round(float(match.group(1)) * frame_rate))
                entries.append(Entry(tokens=[], text="", padding=padding))
        if line:
            _add_entry(idx, line)
    return entries


@dataclass
class TTSResult:
    frames: list          # list of np arrays [B, 1+Q, 1] (undelayed)
    logged_text_tokens: list
    end_steps: list
    all_consumption_times: list
    all_transcripts: list


class TTSModel:
    def __init__(self, lm: LMModel, mimi: MimiModel, tokenizer,
                 machine: StateMachine, delay_steps: int,
                 condition_provider=None, fuser=None,
                 max_speakers: int = DEFAULT_MAX_SPEAKERS,
                 temp: float = 0.6, cfg_coef: float = 1.0,
                 final_padding: int = 4, n_q: int = 32,
                 max_gen_length: int = 30_000, padding_bonus: float = 0.0,
                 voice_suffix: str = "", voice_repo: str | None = None,
                 voice_aliases: dict | None = None):
        self.lm = lm
        self.mimi = mimi
        self.tokenizer = tokenizer
        self.machine = machine
        self.delay_steps = delay_steps
        self.condition_provider = condition_provider
        self.fuser = fuser
        self.max_speakers = max_speakers
        self.temp = temp
        self.cfg_coef = cfg_coef
        self.final_padding = final_padding
        self.n_q = min(n_q, lm.config.dep_q)
        self.max_gen_length = max_gen_length
        self.padding_bonus = padding_bonus
        self.voice_suffix = voice_suffix
        self.voice_repo = voice_repo
        # logical name -> file map (rust worker TtsConfig `voices`,
        # main.rs:77); names not in the map fall back to repo resolution
        self.voice_aliases = dict(voice_aliases or {})

    @property
    def multi_speaker(self) -> bool:
        return (self.condition_provider is not None
                and "speaker_wavs" in self.condition_provider.conditioners)

    @property
    def valid_cfg_conditionings(self) -> set:
        if (self.condition_provider is not None
                and "cfg" in self.condition_provider.conditioners):
            cond = self.condition_provider.conditioners["cfg"]
            if cond.possible_values is not None:
                return set(float(x) for x in cond.possible_values)
        return set()

    def prepare_script(self, script: tp.Sequence[str],
                       padding_between: int = 0) -> list[Entry]:
        return script_to_entries(self.tokenizer, self.machine.token_ids,
                                 self.mimi.frame_rate, script,
                                 multi_speaker=self.multi_speaker,
                                 padding_between=padding_between)

    def make_condition_attributes(self, voice_embeddings: list,
                                  cfg_coef: float | None = None) -> ConditionAttributes:
        """voice_embeddings: list of np arrays [1, T, D] (pre-computed speaker
        embeddings loaded from the voice safetensors' `speaker_wavs`)."""
        tensors = {}
        if voice_embeddings:
            D = np.asarray(voice_embeddings[0]).shape[-1]
            T = np.asarray(voice_embeddings[0]).shape[1]
            voice = np.zeros((1, self.max_speakers, T, D), np.float32)
            mask = np.zeros((1, self.max_speakers, T), bool)
            for i, emb in enumerate(voice_embeddings[: self.max_speakers]):
                emb = np.asarray(emb)
                voice[:, i, : emb.shape[1]] = emb[0]
                mask[:, i, : emb.shape[1]] = True
            tensors["speaker_wavs"] = TensorCondition(
                voice.reshape(1, -1, D), mask.reshape(1, -1))
        text: dict = {"control": "ok"}
        if "cfg" in (self.condition_provider.conditioners
                     if self.condition_provider else {}):
            if cfg_coef is None:
                text["cfg"] = None
            else:
                assert cfg_coef in self.valid_cfg_conditionings, cfg_coef
                text["cfg"] = format(cfg_coef, ".1f")
        return ConditionAttributes(text=text, tensor=tensors)

    def get_voice_path(self, voice_name: str):
        """Resolve a voice name to a local embedding file, potentially
        fetching it from the voice repo (tts.py:630-637); `hf://REPO/PATH`
        selects another repo."""
        from .loaders import hf_get
        if voice_name in self.voice_aliases:
            return hf_get(self.voice_aliases[voice_name], self.voice_repo,
                          check_local_file_exists=True)
        return hf_get(voice_name + self.voice_suffix, self.voice_repo,
                      check_local_file_exists=True)

    @staticmethod
    def load_voice_embedding(path) -> np.ndarray:
        """Load one pre-computed speaker embedding [1, T, D] from a voice
        safetensors (`speaker_wavs` stored [1, D, T], run_tts.py usage)."""
        from safetensors import safe_open
        with safe_open(str(path), framework="numpy") as f:
            emb = f.get_tensor("speaker_wavs")
        return np.transpose(emb, (0, 2, 1))

    def get_prefix(self, mimi_params, wav: np.ndarray) -> np.ndarray:
        """Encode a voice audio prefix (tts.py:685-691).  wav: [T] float."""
        codes = self.mimi.encode(mimi_params, jnp.asarray(wav)[None, None])
        # the reference's mimi is configured to the LM's n_q codebooks
        # (set_num_codebooks at load); trim here instead.  If the codec has
        # FEWER codebooks than the LM consumes (moshi-style checkpoints),
        # the missing rows stay UNGENERATED — i.e. sampled, not forced.
        n_q = self.lm.config.n_q
        avail = np.asarray(codes)[0, :n_q, :-2]
        prefix = np.full((n_q, avail.shape[1]), UNGENERATED_TOKEN, np.int64)
        prefix[: avail.shape[0]] = avail
        null_text = np.full((1, prefix.shape[1]), ZERO_TOKEN, np.int64)
        return np.concatenate([null_text, prefix], axis=0)

    # ---------------------------------------------------------------- generate
    def generate(self, params: dict, all_entries: tp.Sequence[tp.Sequence[Entry]],
                 attributes: tp.Sequence[ConditionAttributes] | None = None,
                 condition_params: dict | None = None,
                 prefixes: list[np.ndarray] | None = None,
                 cfg_is_no_prefix: bool = True, cfg_is_no_text: bool = True,
                 rng: jax.Array | None = None,
                 on_frame: tp.Callable | None = None) -> TTSResult:
        lm = self.lm
        c = lm.config
        B = len(all_entries)
        ids = self.machine.token_ids
        if rng is None:
            rng = jax.random.PRNGKey(0)

        use_cfg = self.cfg_coef != 1.0
        condition_sum = None
        condition_cross = None
        if attributes is not None and self.condition_provider is not None:
            if use_cfg:
                attributes = list(attributes) + dropout_all_conditions(attributes)
            assert condition_params is not None
            tensors = self.condition_provider.prepare_and_provide(
                condition_params, list(attributes))
            if self.fuser is not None:
                condition_sum = self.fuser.get_sum(tensors)
                condition_cross = self.fuser.get_cross(tensors)

        states = [self.machine.new_state(e) for e in all_entries]
        logged_text_tokens: list[list] = [[] for _ in states]

        cfg_masked_until = None
        text_prefixes = None
        audio_prefixes = None
        if prefixes is not None:
            assert len(prefixes) == B
            if cfg_is_no_prefix:
                cfg_masked_until = jnp.asarray(
                    [p.shape[-1] + self.delay_steps for p in prefixes], jnp.int32)
            text_prefixes = [deque(np.asarray(p)[0].tolist()) for p in prefixes]
            audio_prefixes = []
            for p in prefixes:
                K, T = p.shape
                assert K == c.num_codebooks, (K, c.num_codebooks)
                delays = [d + self.delay_steps for d in c.delays[c.audio_offset:]]
                D = max(delays)
                out = np.full((K - 1, T + D), ids.ungenerated, np.int64)
                for k, d in enumerate(delays):
                    out[k, d: d + T] = np.asarray(p)[k + 1]
                audio_prefixes.append(deque(out.T))

        gen = LMGen(lm, LMGenConfig(
            use_sampling=True, temp=self.temp, temp_text=self.temp,
            cfg_coef=self.cfg_coef, cfg_is_no_text=cfg_is_no_text and use_cfg,
            cfg_is_masked_until=cfg_masked_until is not None,
            padding_bonus=self.padding_bonus))
        gstate = gen.init_state(B, rng, dtype=jnp.bfloat16)
        if condition_cross is not None:
            gstate = gen.init_cross_state(gstate, params, condition_cross)

        main_step = jax.jit(gen.main_step, donate_argnums=1)
        depth_step = jax.jit(gen.depth_step, donate_argnums=1)

        missing = c.num_codebooks - c.dep_q - 1
        input_tokens = jnp.full((B, max(missing, 1), 1), ids.zero, jnp.int32)
        no_dep = jnp.full((B, c.dep_q, 1), ids.zero, jnp.int32)
        gen_delays = np.asarray(c.delays[c.audio_offset: c.audio_offset + c.dep_q])

        frames: list[np.ndarray] = []
        for offset in range(self.max_gen_length):
            if all(s.end_step is not None for s in states):
                max_end = max(s.end_step for s in states)
                if offset >= max_end + self.delay_steps + self.final_padding:
                    break
            text_token, _, h, gstate = main_step(
                params, gstate, input_tokens, None, condition_sum,
                cfg_masked_until)
            # Host: the DSM state machine rewrites the sampled text tokens.
            toks = np.asarray(text_token).tolist()
            out_tokens = []
            for b, (tok, st) in enumerate(zip(toks, states)):
                if text_prefixes is not None and text_prefixes[b]:
                    out_tok = text_prefixes[b].popleft()
                else:
                    out_tok, _ = self.machine.process(offset, st, tok)
                out_tokens.append(out_tok)
                logged_text_tokens[b].append((tok, out_tok))
            text_out = jnp.asarray(np.asarray(out_tokens, np.int32))

            # audio forcing data for this step (tts.py:557-570)
            zero_mask = jnp.asarray(offset < gen_delays + self.delay_steps)
            forced = None
            if audio_prefixes is not None:
                fa = np.full((B, c.dep_q), ids.ungenerated, np.int64)
                for b, ap in enumerate(audio_prefixes):
                    if ap:
                        fa[b] = ap.popleft()[: c.dep_q]
                forced = jnp.asarray(fa.astype(np.int32))

            replace = no_dep if offset < self.delay_steps else None
            out, gstate = depth_step(params, gstate, text_out, h,
                                     None, replace, zero_mask, forced)
            out_np = np.asarray(out)
            if (out_np != UNGENERATED_TOKEN).any():
                frames.append(out_np)
                if on_frame is not None:
                    on_frame(out_np)

        return TTSResult(frames, logged_text_tokens,
                         [s.end_step for s in states],
                         [s.consumption_times for s in states],
                         [s.transcript for s in states])

    def synthesize_pcm(self, params: dict, mimi_params: dict,
                       result: TTSResult,
                       prefix_length_frames: list[int] | None = None) -> list[np.ndarray]:
        """Decode a TTSResult's frames into per-item PCM (tts.py:785-799)."""
        if not result.frames:
            return []
        B = result.frames[0].shape[0]
        dec_state = self.mimi.init_decode_state(B)
        pcms = []
        decode = jax.jit(self.mimi.decode_step, donate_argnums=1)
        for frame in result.frames[self.delay_steps:]:
            codes = jnp.clip(jnp.asarray(frame[:, 1:self.n_q + 1]), 0, None)
            pcm, dec_state = decode(mimi_params, dec_state, codes)
            pcms.append(np.clip(np.asarray(pcm), -1, 1))
        pcms = pcms[2:]
        out = []
        for b in range(B):
            start = 0 if prefix_length_frames is None else prefix_length_frames[b]
            end = result.end_steps[b]
            chunks = [p[b, 0] for p in pcms[start:end]]
            out.append(np.concatenate(chunks) if chunks else np.zeros((0,), np.float32))
        return out

    # ---------------------------------------------------------- simple API
    def simple_generate(self, params: dict, mimi_params: dict,
                        text: str | list[str], voice: str | list[str],
                        cfg_coef: float = 2.0,
                        condition_params: dict | None = None,
                        rng: jax.Array | None = None,
                        on_frame: tp.Callable | None = None
                        ) -> list[np.ndarray]:
        """Generate audio directly from text and voice name(s)
        (tts.py:693-800): `text` and `voice` broadcast against each other
        numpy-style — a single item is repeated to match a list; two lists
        must have equal length and voice[i] reads text[i].

        Voice entries: a path to a `.safetensors` voice-embedding file (local,
        or resolved inside `voice_repo` for bare names); or, for audio-prefix
        models (no speaker conditioner), `file://path.wav` — the audio is
        Mimi-encoded and teacher-forced as a prefix.

        Returns one 1-D float32 PCM array per (text, voice) pair at
        `mimi.sample_rate` (lengths vary)."""
        multiple_texts = isinstance(text, list)
        multiple_voices = isinstance(voice, list)
        if not multiple_texts and not multiple_voices:
            texts, voices = [text], [voice]
        elif multiple_texts and not multiple_voices:
            texts, voices = text, [voice] * len(text)
        elif not multiple_texts and multiple_voices:
            texts, voices = [text] * len(voice), voice
        else:
            if len(text) != len(voice):
                raise ValueError("Number of texts and voices must match, got "
                                 f"{len(text)} != {len(voice)}")
            if not text:
                raise ValueError("Got empty list, nothing to generate")
            texts, voices = text, voice

        entries_batch = [self.prepare_script([t], padding_between=1)
                         for t in texts]

        trained_with_cfg_distillation = bool(self.valid_cfg_conditionings)
        if not trained_with_cfg_distillation:
            # pass the CFG coef to the model directly; otherwise it is set
            # via the 'cfg' conditioning attribute below
            self.cfg_coef = cfg_coef

        if self.multi_speaker:
            voice_paths = [v if str(v).endswith(".safetensors")
                           else self.get_voice_path(v) for v in voices]
            attributes = [self.make_condition_attributes(
                [self.load_voice_embedding(vp)],
                cfg_coef=cfg_coef if trained_with_cfg_distillation else None)
                for vp in voice_paths]
            prefixes = None
            prefix_length_frames = [0] * len(voice_paths)
        else:
            from .. import audio as _audio
            attributes = None
            prefixes = []
            for v in voices:
                if not str(v).startswith("file://"):
                    raise ValueError(
                        "this model is conditioned by audio prefix: pass "
                        f"voices as file://path.wav, got {v!r}")
                wav, _ = _audio.read_wav(str(v).removeprefix("file://"),
                                         self.mimi.sample_rate)
                prefixes.append(self.get_prefix(mimi_params, wav[0]))
            prefix_length_frames = [p.shape[-1] for p in prefixes]

        result = self.generate(
            params, entries_batch, attributes=attributes,
            condition_params=condition_params, prefixes=prefixes,
            rng=rng, on_frame=on_frame)
        return self.synthesize_pcm(params, mimi_params, result,
                                   prefix_length_frames=prefix_length_frames)
