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
