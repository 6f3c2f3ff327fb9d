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


def _tiny_tts_greedy():
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
                   temp=0.0, n_q=2, max_gen_length=200, final_padding=2)
    return tts, lm_params, mimi_params


def test_batched_tts_matches_single_streamer():
    """A slot of the batched TTS service must produce exactly the single
    TTSStreamer's audio and word events (greedy decode), while another slot
    is idle/starved — the per-slot exec masks keep them independent."""
    from moshi_tpu.serve.tts_ws import TTSStreamer
    from moshi_tpu.serve.batched_tts import BatchedTTSState

    tts, lm_params, mimi_params = _tiny_tts_greedy()
    words = ["hello world"]

    # --- single-session reference
    s = TTSStreamer(tts, lm_params, mimi_params, jax.random.PRNGKey(2))
    s.feed_words(words)
    s.feed_eos()
    ref_pcm, ref_texts = [], []
    for _ in range(150):
        if s.finished:
            break
        assert not s.starved
        pcm, ev = s.step()
        ref_texts += [e["text"] for e in ev]
        if pcm is not None:
            ref_pcm.append(pcm)
    assert s.finished and ref_pcm

    # --- batched service, slot 0 same script, slot 1 never connected
    st = BatchedTTSState(tts, lm_params, mimi_params, batch_size=2,
                         rng=jax.random.PRNGKey(2))

    async def drive():
        b = await st.acquire_slot()
        assert b == 0
        st.feed_words(b, words)
        st.feed_eos(b)
        for _ in range(200):
            active = st.steppable()
            if not active:
                break
            st.step_batch(active)
        slot = st.slots[b]
        assert slot.done
        got_pcm, got_texts = [], []
        while not slot.queue.empty():
            kind, payload = slot.queue.get_nowait()
            if kind == "pcm":
                got_pcm.append(payload)
            elif kind == "event":
                got_texts.append(payload["text"])
        return got_pcm, got_texts

    got_pcm, got_texts = asyncio.get_event_loop_policy() \
        .new_event_loop().run_until_complete(drive())
    assert got_texts == ref_texts
    assert len(got_pcm) == len(ref_pcm)
    for a, b_ in zip(got_pcm, ref_pcm):
        np.testing.assert_allclose(a, b_, atol=1e-5)


def test_batched_tts_two_clients_ws():
    """Two concurrent ws clients on one BatchedTTSState both stream audio
    and reach Eos."""
    aiohttp = pytest.importorskip("aiohttp")
    import json
    from aiohttp import web, WSMsgType
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.serve.batched_tts import (BatchedTTSState,
                                             handle_batched_tts_socket)

    tts, lm_params, mimi_params = _tiny_tts()
    st = BatchedTTSState(tts, lm_params, mimi_params, batch_size=2,
                         rng=jax.random.PRNGKey(3))

    async def client_session(client, text):
        ws = await client.ws_connect("/api/tts_streaming")
        ready = json.loads((await ws.receive()).data)
        assert ready == {"type": "Ready"}
        await ws.send_str(json.dumps({"type": "Text", "text": text}))
        await ws.send_str(json.dumps({"type": "Eos"}))
        n_audio, texts, eos = 0, [], False
        while True:
            m = await asyncio.wait_for(ws.receive(), timeout=60)
            if m.type == WSMsgType.BINARY and m.data[:1] == b"\x01":
                n_audio += 1
            elif m.type == WSMsgType.TEXT:
                msg = json.loads(m.data)
                if msg["type"] == "Eos":
                    eos = True
                    break
                if msg["type"] == "Text":
                    texts.append(msg["text"])
            else:
                break
        await ws.close()
        return n_audio, texts, eos

    async def run():
        app = web.Application()
        app.router.add_get("/api/tts_streaming",
                           lambda r: handle_batched_tts_socket(r, st))
        client = TestClient(TestServer(app))
        await client.start_server()
        loop_task = asyncio.create_task(st.run_loop())
        try:
            r1, r2 = await asyncio.gather(
                client_session(client, "hello there"),
                client_session(client, "other words here"))
            for n_audio, texts, eos in (r1, r2):
                assert eos
                assert n_audio > 0
                assert texts
        finally:
            loop_task.cancel()
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def _tiny_tts_voiced(temp=0.0):
    """Tiny TTS with cross-attention + speaker_wavs tensor conditioning."""
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.models.tts import TTSModel, StateMachine, TokenIds
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
                   temp=temp, n_q=2, max_gen_length=200, final_padding=2)
    return tts, lm_params, mimi_params, cp_params


def test_tts_voice_conditioning_streamers():
    """Per-session voice conditioning: the batched service slot with voice A
    matches the single streamer with voice A exactly (greedy), and a slot
    with voice B produces different audio."""
    from moshi_tpu.serve.tts_ws import TTSStreamer
    from moshi_tpu.serve.batched_tts import BatchedTTSState

    tts, lm_params, mimi_params, cp_params = _tiny_tts_voiced()
    rs = np.random.RandomState(0)
    voice_a = rs.randn(4, 6).astype(np.float32)
    voice_b = rs.randn(4, 6).astype(np.float32) * 2.0
    words = ["hello world"]

    def run_single(voice):
        s = TTSStreamer(tts, lm_params, mimi_params, jax.random.PRNGKey(2),
                        condition_params=cp_params)
        s.set_voice(voice)
        s.feed_words(words)
        s.feed_eos()
        pcms = []
        for _ in range(150):
            if s.finished:
                break
            pcm, _ = s.step()
            if pcm is not None:
                pcms.append(pcm)
        assert s.finished and pcms
        return np.concatenate(pcms)

    ref_a = run_single(voice_a)
    ref_b = run_single(voice_b)
    assert ref_a.shape != ref_b.shape or not np.allclose(ref_a, ref_b), \
        "voices must influence the output"

    st = BatchedTTSState(tts, lm_params, mimi_params, batch_size=2,
                         rng=jax.random.PRNGKey(2),
                         condition_params=cp_params)

    async def drive():
        b0 = await st.acquire_slot()
        b1 = await st.acquire_slot()
        st.set_slot_voice(b0, voice_a)
        st.set_slot_voice(b1, voice_b)
        for b in (b0, b1):
            st.feed_words(b, words)
            st.feed_eos(b)
        for _ in range(250):
            active = st.steppable()
            if not active:
                break
            st.step_batch(active)
        out = {}
        for b in (b0, b1):
            assert st.slots[b].done
            pcms = []
            while not st.slots[b].queue.empty():
                kind, payload = st.slots[b].queue.get_nowait()
                if kind == "pcm":
                    pcms.append(payload)
            out[b] = np.concatenate(pcms) if pcms else np.zeros(0)
        return out[b0], out[b1]

    got_a, got_b = asyncio.get_event_loop_policy() \
        .new_event_loop().run_until_complete(drive())
    np.testing.assert_allclose(got_a, ref_a, atol=1e-5)
    np.testing.assert_allclose(got_b, ref_b, atol=1e-5)


def test_batched_tts_voice_cleared_on_departure():
    """When the last voiced slot disconnects, the stale cross-attn K/V rows
    must be stripped from the live state so a new voiceless session does not
    cross-attend to the departed speaker (advisor finding r2)."""
    from moshi_tpu.serve.batched_tts import BatchedTTSState

    tts, lm_params, mimi_params, cp_params = _tiny_tts_voiced()
    rs = np.random.RandomState(0)
    voice = rs.randn(4, 6).astype(np.float32)

    st = BatchedTTSState(tts, lm_params, mimi_params, batch_size=2,
                         rng=jax.random.PRNGKey(2),
                         condition_params=cp_params)

    async def drive():
        b = await st.acquire_slot()
        st.set_slot_voice(b, voice)
        st.steppable()  # drains pending ops (reset + voice)
        assert "k_cross" in st.gstate["transformer"]
        await st.release_slot(b)
        b2 = await st.acquire_slot()
        st.steppable()  # drains the reset, which clears the departed voice
        assert "k_cross" not in st.gstate["transformer"]
        return b2

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(drive())


def test_batched_tts_ops_are_queued_not_immediate():
    """acquire_slot / set_slot_voice must not mutate the donated device state
    directly (they can race an in-flight worker-thread step); mutations apply
    at the next steppable() call."""
    from moshi_tpu.serve.batched_tts import BatchedTTSState

    tts, lm_params, mimi_params, cp_params = _tiny_tts_voiced()
    st = BatchedTTSState(tts, lm_params, mimi_params, batch_size=2,
                         rng=jax.random.PRNGKey(2),
                         condition_params=cp_params)

    async def drive():
        before = st.gstate
        b = await st.acquire_slot()
        assert st.gstate is before, "reset must be deferred to the step loop"
        assert b in st.unready and st.pending_ops
        st.steppable()
        assert b not in st.unready and not st.pending_ops

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(drive())


def test_batched_moshi_bf16_mimi():
    """mimi_dtype=bf16 serving knob: the batched frame runs the codec in
    bf16 (params + streaming state), per-slot resets keep dtypes, and the
    wire output stays f32."""
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
                              mimi_dtype=jnp.bfloat16)
    state.warmup()
    assert all(v.dtype != jnp.float32
               for v in jax.tree.leaves(state.mimi_params)
               if jnp.issubdtype(v.dtype, jnp.floating))

    fs = state.frame_size
    pcm = jnp.asarray(np.random.RandomState(0).randn(2, 1, fs) * 0.1,
                      jnp.float32)
    mask = jnp.asarray([True, False])
    out, pcm_out, state.gen_state, state.enc_state, state.dec_state = \
        state._frame(state.lm_params, state.mimi_params, state.gen_state,
                     state.enc_state, state.dec_state, pcm, mask)
    assert pcm_out.dtype == jnp.float32
    # only the active slot's audio goes on the wire; a masked slot's lane
    # computes on frozen state and may emit garbage (it is reset on acquire)
    assert np.isfinite(np.asarray(pcm_out[0])).all()
    # per-slot reset keeps the bf16 streaming state dtypes
    state.gen_state, state.enc_state, state.dec_state = state._reset(
        state.gen_state, state.enc_state, state.dec_state, mask)
    enc_dtypes = {v.dtype for v in jax.tree.leaves(state.enc_state)
                  if jnp.issubdtype(v.dtype, jnp.floating)}
    assert jnp.float32 not in enc_dtypes


def test_batched_moshi_slot_resume():
    """Per-slot session resume in the batched server: a greedy conversation
    split across a disconnect (and resumed into a DIFFERENT slot) produces
    the same outputs as an unbroken session running in parallel."""
    from moshi_tpu.serve.batched_moshi import BatchedMoshiState
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.mimi import MimiModel

    cfg = tiny_lm_config()
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))

    state = BatchedMoshiState(mimi, mimi_params, lm, lm_params, None,
                              batch_size=3, rng=jax.random.PRNGKey(2),
                              temp=0.0, temp_text=0.0)
    state.warmup()
    fs = state.frame_size
    frame = np.zeros(fs, np.float32)

    async def drain(slot, out):
        q = state.slot_queues[slot]
        while not q.empty():
            pcm, tok = q.get_nowait()
            out.append((pcm.tobytes(), tok))

    async def feed(slots):
        for s in slots:
            state.slot_pcm[s] = np.concatenate([state.slot_pcm[s], frame])
        await asyncio.sleep(0.05)

    async def scenario():
        loop_task = asyncio.create_task(state.run_loop())
        ref = await state.acquire_slot()          # unbroken reference session
        user = await state.acquire_slot()         # the session that drops
        out_ref, out_user = [], []
        for _ in range(6):
            await feed([ref, user])
            await drain(ref, out_ref)
            await drain(user, out_user)
        rid = state.issue_resume_id(user)
        await drain(user, out_user)
        await state.release_slot(user)            # snapshot taken here

        # a third party takes (and dirties) the freed slot
        other = await state.acquire_slot()
        for _ in range(2):
            await feed([ref, other])
            await drain(ref, out_ref)

        # the user resumes — lands in the remaining slot
        back = await state.acquire_slot(resume=rid)
        assert state.slot_resumed[back] is True
        assert back not in (ref, other)
        for _ in range(4):
            await feed([ref, back])
            await drain(ref, out_ref)
            await drain(back, out_user)
        for _ in range(40):
            await asyncio.sleep(0.05)
            await drain(ref, out_ref)
            await drain(back, out_user)
            if len(out_user) >= 7:  # 10 frames - 1 skip - 2 delay steps
                break
        loop_task.cancel()
        # ref saw 2 extra frames during the gap, so user's stream is a
        # strict prefix of the unbroken reference stream
        assert len(out_user) >= 6
        assert out_ref[:len(out_user)] == out_user, "resumed slot diverged"

        # an expired/unknown token starts fresh
        await state.release_slot(back)
        stale = await state.acquire_slot(resume="nope")
        assert state.slot_resumed[stale] is False

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(scenario())


def test_per_slot_reset_ambiguous_batch_axis():
    """B == num_layers regression: transformer KV leaves are [L, B, ...] and
    with L == B a shape heuristic mislocates the batch axis, resetting whole
    LAYERS across every slot (real deployments hit this at B=8 with the
    8-layer full-size Mimi transformer and at B=32 with the 32-layer 7B).
    The structural batch-axes fix must leave the other slot untouched."""
    from moshi_tpu.serve.batched_moshi import BatchedMoshiState
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.utils.trees import take_slots, state_batch_axes

    B = 2
    cfg = tiny_lm_config(num_layers=B)  # LM transformer KV: [2, 2, ...]
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())  # mimi transformers: 2 layers
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))

    state = BatchedMoshiState(mimi, mimi_params, lm, lm_params, None,
                              batch_size=B, rng=jax.random.PRNGKey(2))
    fs = state.frame_size
    pcm = jnp.asarray(np.random.RandomState(0).randn(B, 1, fs) * 0.1,
                      jnp.float32)
    mask = jnp.ones((B,), bool)
    for _ in range(3):
        _, _, state.gen_state, state.enc_state, state.dec_state = state._frame(
            lm_params, mimi_params, state.gen_state, state.enc_state,
            state.dec_state, pcm, mask)

    idx1 = jnp.asarray([1])

    def slot1_view():
        return (
            {k: take_slots(state.gen_state[k], idx1, B, state._ax_gen[k])
             for k in ("cache", "offsets", "transformer")},
            take_slots(state.enc_state, idx1, B, state._ax_enc),
            take_slots(state.dec_state, idx1, B, state._ax_dec),
        )

    before = jax.tree.map(np.asarray, slot1_view())
    state.reset_slot(0)
    after = jax.tree.map(np.asarray, slot1_view())
    jax.tree.map(np.testing.assert_array_equal, before, after)

    # slot 0 really was reset
    assert int(state.gen_state["offsets"][0]) == 0
    assert int(state.gen_state["offsets"][1]) == 3
    k = np.asarray(state.gen_state["transformer"]["k"])
    assert k.shape[0] == B and k.shape[1] == B  # the ambiguous layout
    assert not np.any(k[:, 0]) or np.any(k[:, 1])  # slot 0 cleared, 1 kept


def test_batched_moshi_mesh_serving():
    """Mesh-sharded batched serving (--tp): a (dp=2, tp=4) virtual mesh must
    produce the same greedy tokens as the single-device instance, and
    per-slot reset + snapshot/resume must work on sharded state."""
    from moshi_tpu.serve.batched_moshi import BatchedMoshiState
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_lm_config(num_heads=4)  # heads divisible by tp=4
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))

    B = 4
    kw = dict(batch_size=B, temp=0.0, temp_text=0.0)
    # separate rng arrays: the first instance's donated step would delete a
    # shared key buffer out from under the second
    single = BatchedMoshiState(mimi, mimi_params, lm, lm_params, None,
                               rng=jax.random.PRNGKey(2), **kw)
    mesh = make_mesh(8, tp=4)
    sharded = BatchedMoshiState(mimi, mimi_params, lm, lm_params, None,
                                rng=jax.random.PRNGKey(2), mesh=mesh, **kw)

    fs = single.frame_size
    rs = np.random.RandomState(0)
    pcm = (rs.randn(B, 1, fs) * 0.1).astype(np.float32)
    mask = np.ones((B,), bool)

    def step(st):
        c, m = st._put_inputs(pcm, mask)
        out, pcm_out, st.gen_state, st.enc_state, st.dec_state = st._frame(
            st.lm_params, st.mimi_params, st.gen_state, st.enc_state,
            st.dec_state, c, m)
        return np.asarray(out), np.asarray(pcm_out)

    for i in range(4):
        out_s, pcm_s = step(single)
        out_m, pcm_m = step(sharded)
        np.testing.assert_array_equal(out_s, out_m)
        np.testing.assert_allclose(pcm_s, pcm_m, atol=2e-4)

    # per-slot reset on sharded state leaves the other slots untouched
    before1 = np.asarray(sharded.gen_state["offsets"])
    sharded.reset_slot(0)
    off = np.asarray(sharded.gen_state["offsets"])
    assert off[0] == 0 and (off[1:] == before1[1:]).all()

    # snapshot/restore round-trip on sharded state
    rid_state = sharded._extract(sharded.gen_state, sharded.enc_state,
                                 sharded.dec_state, np.int32(1))
    sharded.restore_slot(2, rid_state)
    off2 = np.asarray(sharded.gen_state["offsets"])
    assert off2[2] == off[1]


def test_batched_tts_slot_resume():
    """TTS per-slot resume: a synthesis split across a disconnect (resumed
    into a DIFFERENT slot, with another tenant dirtying the freed one)
    produces exactly the unbroken single-streamer's audio and words."""
    from moshi_tpu.serve.tts_ws import TTSStreamer
    from moshi_tpu.serve.batched_tts import BatchedTTSState

    tts, lm_params, mimi_params = _tiny_tts_greedy()
    words = ["hello world again"]

    # unbroken reference
    s = TTSStreamer(tts, lm_params, mimi_params, jax.random.PRNGKey(2))
    s.feed_words(words)
    s.feed_eos()
    ref_pcm, ref_texts = [], []
    for _ in range(200):
        if s.finished:
            break
        pcm, ev = s.step()
        ref_texts += [e["text"] for e in ev]
        if pcm is not None:
            ref_pcm.append(pcm)
    assert s.finished and ref_pcm

    st = BatchedTTSState(tts, lm_params, mimi_params, batch_size=2,
                         rng=jax.random.PRNGKey(2))

    def drain(slot_obj, pcms, texts):
        while not slot_obj.queue.empty():
            kind, payload = slot_obj.queue.get_nowait()
            if kind == "pcm":
                pcms.append(payload)
            elif kind == "event":
                texts.append(payload["text"])

    async def drive():
        got_pcm, got_texts = [], []
        b = await st.acquire_slot()
        st.feed_words(b, words)
        st.feed_eos(b)
        rid = st.issue_resume_id(b)
        for _ in range(8):  # partial synthesis
            active = st.steppable()
            assert active
            st.step_batch(active)
        drain(st.slots[b], got_pcm, got_texts)
        await st.release_slot(b)  # queues the snapshot

        # another tenant takes (and dirties) the freed slot
        other = await st.acquire_slot()
        assert other == b
        st.feed_words(other, ["noise"])
        for _ in range(3):
            active = st.steppable()
            if active:
                st.step_batch(active)

        # resume into the remaining slot
        back = await st.acquire_slot(resume=rid)
        assert back is not None and back != other
        assert st.slot_resumed[back] is True
        for _ in range(200):
            active = st.steppable()
            if back not in active and st.slots[back].done:
                break
            if not active:
                break
            st.step_batch(active)
        assert st.slots[back].done
        drain(st.slots[back], got_pcm, got_texts)
        return got_pcm, got_texts

    got_pcm, got_texts = asyncio.get_event_loop_policy() \
        .new_event_loop().run_until_complete(drive())
    assert got_texts == ref_texts
    assert len(got_pcm) == len(ref_pcm)
    for a, b_ in zip(got_pcm, ref_pcm):
        np.testing.assert_allclose(a, b_, atol=1e-5)
