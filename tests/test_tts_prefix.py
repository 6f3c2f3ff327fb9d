"""TTS audio-prefix voice conditioning: prefix tokens are force-fed (text and
audio) and generation continues past them (tts.py:536-570 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from test_lm import tiny_lm_config
from test_mimi import tiny_mimi_config
from test_tts_asr import FakeTokenizer
from moshi_tpu.models.lm import LMModel, ZERO_TOKEN
from moshi_tpu.models.mimi import MimiModel
from moshi_tpu.models.tts import TTSModel, StateMachine, TokenIds


def test_tts_generate_with_audio_prefix():
    cfg = tiny_lm_config(n_q=2, dep_q=2, delays=(0, 0, 1))
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))

    machine = StateMachine(TokenIds(card=cfg.text_card + 1), max_padding=3,
                           initial_padding=1)
    tts = TTSModel(lm, mimi, FakeTokenizer(), machine, delay_steps=2,
                   temp=0.7, n_q=2, max_gen_length=100, final_padding=2)

    # build a fake audio prefix: [1 + n_q, T_prefix] with null text row
    Tp = 4
    rs = np.random.RandomState(0)
    prefix = np.concatenate([
        np.full((1, Tp), ZERO_TOKEN, np.int64),
        rs.randint(0, cfg.card, (cfg.n_q, Tp)).astype(np.int64),
    ])

    entries = tts.prepare_script(["hi there"])
    result = tts.generate(lm_params, [entries], prefixes=[prefix],
                          rng=jax.random.PRNGKey(2))
    assert result.end_steps[0] is not None
    assert len(result.frames) > Tp
    # during the prefix the text inputs were the forced prefix row: the logged
    # (sampled, fed) pairs show the fed token equals the prefix value
    fed = [pair[1] for pair in result.logged_text_tokens[0][:Tp]]
    assert fed == list(prefix[0][:Tp])
    # the forced audio appears in the output frames at the delayed positions
    frames = np.concatenate(result.frames, axis=-1)[0]  # [1+dep_q, T]
    # audio stream k=1 (delay 0 within gen streams) should contain the prefix
    # values (force-fed via forced_audio) somewhere in the early frames
    found = 0
    for t in range(Tp):
        if prefix[1, t] in frames[1][: Tp + tts.delay_steps + 2]:
            found += 1
    assert found >= Tp - 1, (found, prefix[1], frames[1][:10])


def _voiced_tts(tmp_path):
    """Tiny multi-speaker TTS + two voice-embedding safetensors on disk."""
    from moshi_tpu.conditioners import (ConditionProvider, TensorConditioner,
                                        ConditionFuser)
    cfg = tiny_lm_config(n_q=2, dep_q=2, delays=(0, 0, 1),
                         cross_attention=True)
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))
    machine = StateMachine(TokenIds(card=cfg.text_card + 1), max_padding=3,
                           initial_padding=1)
    provider = ConditionProvider(
        {"speaker_wavs": TensorConditioner(output_dim=cfg.dim, dim=6)})
    fuser = ConditionFuser({"cross": ["speaker_wavs"]})
    cp_params = provider.init_params(jax.random.PRNGKey(2))
    tts = TTSModel(lm, mimi, FakeTokenizer(), machine, delay_steps=2,
                   condition_provider=provider, fuser=fuser, max_speakers=1,
                   temp=0.0, n_q=2, max_gen_length=60, final_padding=2,
                   voice_repo=str(tmp_path))
    from safetensors.numpy import save_file
    rs = np.random.RandomState(3)
    for name in ("alice", "bob"):
        # stored [1, D, T] like the reference voice files (run_tts.py usage)
        save_file({"speaker_wavs": rs.randn(1, 6, 4).astype(np.float32)},
                  tmp_path / f"{name}.safetensors")
    return tts, lm_params, mimi_params, cp_params


def test_simple_generate_broadcast(tmp_path):
    """simple_generate broadcasts text x voice numpy-style and matches the
    manual generate()+synthesize_pcm pipeline exactly (tts.py:693-800)."""
    tts, lm_params, mimi_params, cp_params = _voiced_tts(tmp_path)
    va = str(tmp_path / "alice.safetensors")
    vb = str(tmp_path / "bob.safetensors")

    # 1x1
    pcms = tts.simple_generate(lm_params, mimi_params, "hello world", va,
                               cfg_coef=1.0, condition_params=cp_params,
                               rng=jax.random.PRNGKey(5))
    assert len(pcms) == 1 and pcms[0].ndim == 1 and pcms[0].size > 0
    assert pcms[0].dtype == np.float32

    # broadcast: 2 texts x 1 voice, 1 text x 2 voices, 2 x 2
    p2 = tts.simple_generate(lm_params, mimi_params,
                             ["hello world", "more text here"], va,
                             cfg_coef=1.0, condition_params=cp_params,
                             rng=jax.random.PRNGKey(5))
    assert len(p2) == 2
    p3 = tts.simple_generate(lm_params, mimi_params, "hello world", [va, vb],
                             cfg_coef=1.0, condition_params=cp_params,
                             rng=jax.random.PRNGKey(5))
    assert len(p3) == 2
    assert all(np.isfinite(p).all() for p in p3)  # NaN would make the
    # bit-exact assertions below vacuous (equal_nan) — guard first.
    # Same text, same rng, voice A in slot 0: the batched run matches the
    # 1x1 run to float tolerance.  NOT bit-wise: XLA folds batch into the
    # matmul M dimension and selects a different gemm kernel (different
    # accumulation order) per batch size, so B=1 and B=2 programs round
    # differently at the last ULP.  The bit-exact invariant is
    # *within-batch slot independence*, asserted below.
    assert p3[0].shape == pcms[0].shape
    np.testing.assert_allclose(p3[0], pcms[0], rtol=1e-4, atol=1e-6)

    # THE invariant (reference ScatteredKvCache truth table,
    # rust/moshi-core/src/kv_cache.rs:255-328): slots of ONE batch are fully
    # independent — two slots with identical inputs are bit-identical, no
    # matter what runs in the other slots.
    p4 = tts.simple_generate(lm_params, mimi_params,
                             ["hello world", "more text here", "hello world"],
                             [va, vb, va],
                             cfg_coef=1.0, condition_params=cp_params,
                             rng=jax.random.PRNGKey(5))
    assert len(p4) == 3
    assert p4[0].shape == p4[2].shape
    assert np.array_equal(p4[0], p4[2])
    # and the batched slot matches the B=2 run of the same batch shape?  No —
    # different batch sizes are different XLA programs (see above); only the
    # same-shape comparison is bit-exact.

    import pytest
    with pytest.raises(ValueError):
        tts.simple_generate(lm_params, mimi_params, ["a", "b"], [va, vb, va],
                            cfg_coef=1.0, condition_params=cp_params)

    # equivalence with the manual pipeline (greedy, same rng)
    entries = [tts.prepare_script(["hello world"], padding_between=1)]
    attrs = [tts.make_condition_attributes([tts.load_voice_embedding(va)])]
    result = tts.generate(lm_params, entries, attributes=attrs,
                          condition_params=cp_params,
                          rng=jax.random.PRNGKey(5))
    manual = tts.synthesize_pcm(lm_params, mimi_params, result,
                                prefix_length_frames=[0])
    assert manual[0].shape == pcms[0].shape
    # same batch shape (B=1) => same XLA program => bit-exact
    assert np.array_equal(manual[0], pcms[0])


def test_simple_generate_voice_name_resolution(tmp_path):
    """Bare voice names resolve inside voice_repo with the model's suffix."""
    tts, lm_params, mimi_params, cp_params = _voiced_tts(tmp_path)
    tts.voice_suffix = ".safetensors"
    pcms = tts.simple_generate(lm_params, mimi_params, "hello world", "alice",
                               cfg_coef=1.0, condition_params=cp_params,
                               rng=jax.random.PRNGKey(5))
    assert len(pcms) == 1 and pcms[0].size > 0


def test_simple_generate_audio_prefix(tmp_path):
    """file:// voices drive the audio-prefix (non-multi-speaker) path."""
    from moshi_tpu import audio as maudio
    cfg = tiny_lm_config(n_q=2, dep_q=2, delays=(0, 0, 1))
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))
    machine = StateMachine(TokenIds(card=cfg.text_card + 1), max_padding=3,
                           initial_padding=1)
    tts = TTSModel(lm, mimi, FakeTokenizer(), machine, delay_steps=2,
                   temp=0.0, n_q=2, max_gen_length=60, final_padding=2)

    sr = mimi.sample_rate
    wav = (0.05 * np.sin(np.linspace(0, 300, mimi.frame_size * 4))
           ).astype(np.float32)
    maudio.write_wav(tmp_path / "voice.wav", wav, sr)

    pcms = tts.simple_generate(lm_params, mimi_params, "hi there",
                               f"file://{tmp_path / 'voice.wav'}",
                               cfg_coef=1.0, rng=jax.random.PRNGKey(2))
    assert len(pcms) == 1 and pcms[0].ndim == 1

    import pytest
    with pytest.raises(ValueError):
        tts.simple_generate(lm_params, mimi_params, "hi", "not-a-prefix",
                            cfg_coef=1.0)
