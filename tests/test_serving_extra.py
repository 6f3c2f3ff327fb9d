"""Streaming TTS session and batched full-duplex serving smoke tests."""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_lm import tiny_lm_config
from test_mimi import tiny_mimi_config
from test_tts_asr import FakeTokenizer


def _tiny_tts():
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.models.tts import TTSModel, StateMachine, TokenIds

    cfg = tiny_lm_config(n_q=2, dep_q=2, delays=(0, 0, 1))
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))
    machine = StateMachine(TokenIds(card=cfg.text_card + 1), max_padding=3,
                           initial_padding=1)
    tts = TTSModel(lm, mimi, FakeTokenizer(), machine, delay_steps=2,
                   temp=0.7, n_q=2, max_gen_length=200, final_padding=2)
    return tts, lm_params, mimi_params


def test_tts_streamer_incremental():
    from moshi_tpu.serve.tts_ws import TTSStreamer
    tts, lm_params, mimi_params = _tiny_tts()
    s = TTSStreamer(tts, lm_params, mimi_params, jax.random.PRNGKey(2))

    s.feed_words(["hello world"])
    pcms, events = [], []
    for i in range(150):
        if s.finished:
            break
        if s.starved:
            # simulate words arriving late, then EOS
            if i < 60:
                s.feed_words(["again"])
            else:
                s.feed_eos()
            continue
        pcm, ev = s.step()
        events.extend(ev)
        if pcm is not None:
            pcms.append(pcm)
    assert s.finished
    assert pcms, "no audio generated"
    texts = [e["text"] for e in events]
    assert texts[:2] == ["hello", "world"]
    assert "again" in texts
    assert all(e["start_s"] >= 0 for e in events)


def test_batched_moshi_slots():
    from moshi_tpu.serve.batched_moshi import BatchedMoshiState
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.mimi import MimiModel

    cfg = tiny_lm_config()
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))

    state = BatchedMoshiState(mimi, mimi_params, lm, lm_params, None,
                              batch_size=2, rng=jax.random.PRNGKey(2))
    state.warmup()

    async def scenario():
        s0 = await state.acquire_slot()
        s1 = await state.acquire_slot()
        assert {s0, s1} == {0, 1}
        assert await state.acquire_slot() is None  # full
        loop_task = asyncio.create_task(state.run_loop())
        fs = state.frame_size
        rs = np.random.RandomState(0)
        for _ in range(8):
            state.slot_pcm[s0] = np.concatenate(
                [state.slot_pcm[s0], rs.randn(fs).astype(np.float32) * 0.1])
            state.slot_pcm[s1] = np.concatenate(
                [state.slot_pcm[s1], rs.randn(fs).astype(np.float32) * 0.1])
            await asyncio.sleep(0.02)
        # wait for outputs
        got0 = got1 = 0
        for _ in range(200):
            if not state.slot_queues[s0].empty():
                state.slot_queues[s0].get_nowait()
                got0 += 1
            if not state.slot_queues[s1].empty():
                state.slot_queues[s1].get_nowait()
                got1 += 1
            if got0 >= 2 and got1 >= 2:
                break
            await asyncio.sleep(0.05)
        loop_task.cancel()
        assert got0 >= 2 and got1 >= 2, (got0, got1)
        await state.release_slot(s0)
        s2 = await state.acquire_slot()
        assert s2 == s0  # slot recycled with reset

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(scenario())


def test_batched_moshi_reset_slot_with_cfg():
    """reset_slot must handle cfg_coef != 1 where the transformer state is
    allocated at 2x batch (ADVICE r1: raised 'cannot locate batch axis')."""
    from moshi_tpu.serve.batched_moshi import BatchedMoshiState
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.mimi import MimiModel

    cfg = tiny_lm_config()
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))

    state = BatchedMoshiState(mimi, mimi_params, lm, lm_params, None,
                              batch_size=2, rng=jax.random.PRNGKey(2),
                              cfg_coef=2.0, cfg_is_no_text=True)
    assert state.gen_state["transformer"]["offset"].shape[0] == 4
    # run a frame so state is nonzero, then reset slot 0
    fs = state.frame_size
    pcm = jnp.asarray(np.random.RandomState(0).randn(2, 1, fs) * 0.1, jnp.float32)
    mask = jnp.ones((2,), bool)
    _, _, state.gen_state, state.enc_state, state.dec_state = state._frame(
        lm_params, mimi_params, state.gen_state, state.enc_state,
        state.dec_state, pcm, mask)
    assert int(state.gen_state["offsets"][0]) == 1
    state.reset_slot(0)
    assert int(state.gen_state["offsets"][0]) == 0
    assert int(state.gen_state["offsets"][1]) == 1
    # both CFG halves of slot 0's transformer state were reset
    tr_off = np.asarray(state.gen_state["transformer"]["offset"])
    assert tr_off[0] == 0 and tr_off[2] == 0
    assert tr_off[1] == 1 and tr_off[3] == 1
