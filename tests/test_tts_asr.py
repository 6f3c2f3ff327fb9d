"""TTS state machine parity with the reference, split-step consistency of
LMGen, and ASR word-event behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.tts import (TokenIds, Entry, StateMachine,
                                  script_to_entries)
from moshi_tpu.models.lm import UNGENERATED_TOKEN
from moshi_tpu.models.lm_gen import LMGen, LMGenConfig


class FakeTokenizer:
    def encode(self, word):
        return [10 + (ord(c) % 50) for c in word]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


def _entries():
    return [Entry(tokens=[11, 12], text="hi", padding=0),
            Entry(tokens=[], text="", padding=5),
            Entry(tokens=[13], text="yo", padding=2),
            Entry(tokens=[14, 15, 16], text="worlds", padding=0)]


@pytest.mark.parametrize("second_stream", [0, 2])
def test_state_machine_parity_with_reference(second_stream):
    pytest.importorskip("torch")
    from refutil import import_reference
    import_reference()
    from moshi.models import tts as ref_tts

    ids = TokenIds(card=1001)
    rids = ref_tts.TokenIds(card=1001)
    m = StateMachine(ids, second_stream_ahead=second_stream, max_padding=4,
                     initial_padding=2)
    rm = ref_tts.StateMachine(rids, second_stream_ahead=second_stream,
                              max_padding=4, initial_padding=2)

    rs = np.random.RandomState(0)
    model_tokens = rs.choice([0, 3, 7], size=200).tolist()

    st = m.new_state(_entries())
    rst = rm.new_state(_entries())
    for step, tok in enumerate(model_tokens):
        out, consumed = m.process(step, st, tok)
        rout, rconsumed = rm.process(step, rst, tok)
        assert (out, consumed) == (rout, rconsumed), f"step {step}"
    assert st.end_step == rst.end_step
    assert st.transcript == rst.transcript
    assert st.consumption_times == rst.consumption_times


def test_script_to_entries_parity():
    pytest.importorskip("torch")
    from refutil import import_reference
    import_reference()
    from moshi.models import tts as ref_tts

    tok = FakeTokenizer()
    ids = TokenIds(card=1001)
    rids = ref_tts.TokenIds(card=1001)
    script = ["Hello there: friend", 'wait <break time="1.2s"/> ok', "(yes) sure’s"]
    mine = script_to_entries(tok, ids, 12.5, script, multi_speaker=True,
                             padding_between=1)
    ref = ref_tts.script_to_entries(tok, rids, 12.5, script, multi_speaker=True,
                                    padding_between=1)
    assert len(mine) == len(ref)
    for a, b in zip(mine, ref):
        assert a.tokens == b.tokens, (a, b)
        assert a.text == b.text
        assert a.padding == b.padding


def test_split_step_matches_fused():
    """main_step + depth_step must equal the fused step (greedy)."""
    from test_lm import tiny_lm_config
    from moshi_tpu.models.lm import LMModel

    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    gen = LMGen(model, LMGenConfig(use_sampling=False))
    B, T = 2, 8
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    rs = np.random.RandomState(0)
    tokens = rs.randint(0, cfg.card, (B, n_in, T)).astype(np.int32)

    s1 = gen.init_state(B, jax.random.PRNGKey(1), dtype=jnp.float32)
    s2 = gen.init_state(B, jax.random.PRNGKey(1), dtype=jnp.float32)
    for t in range(T):
        it = jnp.asarray(tokens[:, :, t:t + 1])
        o1, s1 = gen.step(params, s1, it)
        text_tok, _, h, s2 = gen.main_step(params, s2, it)
        o2, s2 = gen.depth_step(params, s2, text_tok, h)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2), err_msg=f"t={t}")


def test_tiny_tts_generation_runs():
    """End-to-end DSM TTS loop on a tiny random model: all queued words must be
    consumed, frames produced, and end_steps set."""
    from test_lm import tiny_lm_config
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.tts import TTSModel
    from test_mimi import tiny_mimi_config
    from moshi_tpu.models.mimi import MimiModel

    cfg = tiny_lm_config(n_q=2, dep_q=2, delays=(0, 0, 1))
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))

    tok = FakeTokenizer()
    machine = StateMachine(TokenIds(card=cfg.text_card + 1), max_padding=3,
                           initial_padding=1)
    tts = TTSModel(model, mimi, tok, machine, delay_steps=2, temp=0.7,
                   n_q=2, max_gen_length=120, final_padding=2)
    entries = tts.prepare_script(["hello world this is a test"])
    result = tts.generate(params, [entries], rng=jax.random.PRNGKey(2))
    assert result.end_steps[0] is not None
    assert len(result.frames) > 0
    assert [w for w, _ in result.all_transcripts[0]] == \
        ["hello", "world", "this", "is", "a", "test"]
    # every frame is a full valid token set after the delay
    assert all((f != UNGENERATED_TOKEN).all() for f in result.frames)


def test_asr_word_events():
    """Drive StreamingASR with a stubbed text sampler and check word/timestamp
    events (asr.rs:219-251 semantics)."""
    from test_lm import tiny_lm_config
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.asr import StreamingASR, AsrWord, AsrEndWord
    from test_mimi import tiny_mimi_config
    from moshi_tpu.models.mimi import MimiModel

    cfg = tiny_lm_config(n_q=4, dep_q=0, delays=(0, 0, 0, 0, 0),
                         extra_heads_num_heads=2, extra_heads_dim=2)
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())

    asr = StreamingASR(mimi, model, batch_size=1, asr_delay_in_tokens=3,
                       temperature=0.0)
    # stub the device step to emit a scripted token stream
    script = [3, 3, 3, 5, 6, 0, 3, 7, 0, 3]
    calls = {"n": 0}
    real_fn = asr._step_fn

    def fake_step(lm_params, tr_state, tokens, rng, exec_mask):
        tok, prs, tr_state, rng = real_fn(lm_params, tr_state, tokens, rng, exec_mask)
        t = script[calls["n"] % len(script)]
        calls["n"] += 1
        return jnp.full_like(tok, t), prs, tr_state, rng

    asr._step_fn = fake_step
    state = asr.init_state(jax.random.PRNGKey(1), dtype=jnp.float32)
    tokens = np.random.RandomState(0).randint(0, cfg.card, (1, 4, len(script)))
    msgs, state = asr.step_tokens(params, state, tokens.astype(np.int32))

    words = [m for m in msgs if isinstance(m, AsrWord)]
    ends = [m for m in msgs if isinstance(m, AsrEndWord)]
    # steps >= delay(3): steps 4..10 see tokens 5,6,0,3,7,0,3
    assert len(words) == 2
    assert words[0].tokens == [5, 6]
    assert words[1].tokens == [7]
    assert len(ends) == 2
    assert ends[0].stop_time == pytest.approx((6 - 3) / 12.5)
    assert ends[1].stop_time == pytest.approx((9 - 3) / 12.5)


def test_spm_tokenizer_roundtrip():
    """Pure-python SPM reader parity with an actual .model file if one can be
    found; otherwise construct a synthetic model proto."""
    import struct
    from moshi_tpu.text.spm import SentencePieceTokenizer

    # Build a tiny synthetic unigram model protobuf.
    def piece(p, score, ptype=1):
        body = b""
        pb = p.encode("utf-8")
        body += b"\x0a" + bytes([len(pb)]) + pb           # field 1 string
        body += b"\x15" + struct.pack("<f", score)         # field 2 float
        if ptype != 1:
            body += b"\x18" + bytes([ptype])               # field 3 enum
        return b"\x0a" + bytes([len(body)]) + body         # ModelProto field 1

    blob = b"".join([
        piece("<unk>", 0.0, 2), piece("<s>", 0.0, 3), piece("</s>", 0.0, 3),
        piece("▁hello", -1.0), piece("▁world", -1.5),
        piece("▁", -10.0), piece("h", -5.0), piece("e", -5.0),
        piece("l", -5.0), piece("o", -5.0), piece("w", -5.0),
        piece("r", -5.0), piece("d", -5.0), piece("x", -5.0),
    ])
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".model", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        tok = SentencePieceTokenizer(path)
        ids = tok.encode("hello world")
        assert tok.decode(ids) == "hello world"
        assert len(ids) == 2  # whole-word pieces beat char pieces
        assert tok.id_to_piece(ids[0]) == "▁hello"
    finally:
        os.unlink(path)
