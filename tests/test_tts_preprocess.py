"""TTS text normalization/segmentation vs rust tts_preprocess.rs:1-133,
including the reference's own test_segment_parser cases (102-133)."""

from moshi_tpu.text.tts_preprocess import (normalize, parse_segments,
                                           BreakTime, TtsPreprocessor)


def test_normalize_table():
    # tts_preprocess.rs:11-13
    cases = [
        ("don’t", "don't"),
        ("a–b", "ab"),
        ("time: now", "time  now"),
        ("(aside)", "aside"),
        ("plain", "plain"),
    ]
    for raw, want in cases:
        assert normalize(raw) == want, raw


def test_segment_parser_reference_cases():
    # mirrors rust test_segment_parser (tts_preprocess.rs:102-133)
    segs = parse_segments('Hello <break time="0.5s"/> world <break time="1.0s"/>!')
    assert segs == ["Hello ", BreakTime(0.5), " world ", BreakTime(1.0), "!"]

    segs = parse_segments('Hello <break time="0.5s"/> world <break time="1.0s"/>  ')
    assert segs == ["Hello ", BreakTime(0.5), " world ", BreakTime(1.0)]

    segs = parse_segments('<break time="0.5s"/>yay!<break time="1.0s"/>  ')
    assert segs == [BreakTime(0.5), "yay!", BreakTime(1.0)]


class _Tok:
    def encode(self, word):
        return [100 + len(word)]


def test_preprocessor_words_breaks_and_bos():
    p = TtsPreprocessor(_Tok(), text_bos_token=1, pad_token=3)
    out = p.preprocess('Hi there <break time="0.4s"/> again')
    words = [(w.word, w.tokens) for w in out]
    # BOS only on the very first word of the session (tts_preprocess.rs:79-83)
    assert words[0] == ("Hi", [1, 102])
    assert words[1] == ("there", [105])
    # 0.4s * 12.5 = 5 pads (tts_preprocess.rs:90-96)
    assert words[2] == ('<break time="0.40s">', [3] * 5)
    assert words[3] == ("again", [105])
    # second call: no second BOS
    out2 = p.preprocess("more")
    assert out2[0].tokens == [104]


def test_preprocessor_break_clamping():
    p = TtsPreprocessor(_Tok())
    # clamped at 10 s -> 125 pads; tiny positive break -> at least 1 pad
    out = p.preprocess('<break time="60s"/>x<break time="0.01s"/>')
    assert len(out[0].tokens) == 125
    assert len(out[2].tokens) == 1
    # zero-length breaks are dropped (secs > 0.0 check)
    assert len(p.preprocess('<break time="0s"/>done')) == 1


def test_streamer_feed_words_handles_breaks():
    """TTSStreamer.feed_words turns breaks into padding entries."""
    import jax
    import jax.numpy as jnp
    from test_lm import tiny_lm_config
    from test_mimi import tiny_mimi_config
    from test_tts_asr import FakeTokenizer
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.models.tts import TTSModel, StateMachine, TokenIds
    from moshi_tpu.serve.tts_ws import TTSStreamer

    cfg = tiny_lm_config(n_q=2, dep_q=2, delays=(0, 0, 1))
    lm = LMModel(cfg)
    mimi = MimiModel(tiny_mimi_config())
    machine = StateMachine(TokenIds(card=cfg.text_card + 1), max_padding=3,
                           initial_padding=1)
    tts = TTSModel(lm, mimi, FakeTokenizer(), machine, delay_steps=2,
                   temp=0.7, n_q=2, max_gen_length=50, final_padding=2)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))
    s = TTSStreamer(tts, lm_params, mimi_params, jax.random.PRNGKey(2))
    s.feed_words(['don’t <break time="0.8s"/> (stop)'])
    entries = list(s.state.entries)
    assert entries[0].text == "don't"
    assert entries[1].text == "" and entries[1].padding == 10  # 0.8*12.5
    assert entries[2].text == "stop"
