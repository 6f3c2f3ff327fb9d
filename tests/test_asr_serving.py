"""STT offline mode (dep_q=0) through run_inference, and the batched ASR
websocket service end-to-end (msgpack wire protocol, Markers, Step/VAD)."""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_lm import tiny_lm_config
from test_mimi import tiny_mimi_config
from moshi_tpu.models.lm import LMModel
from moshi_tpu.models.mimi import MimiModel


def _tiny_stt(extra_heads: int = 0):
    cfg = tiny_lm_config(n_q=4, dep_q=0, delays=(0, 0, 0, 0, 0),
                         extra_heads_num_heads=extra_heads, extra_heads_dim=2)
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))
    return lm, lm_params, mimi, mimi_params


def test_run_inference_stt_mode():
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.run_inference import InferenceState

    lm, lm_params, mimi, mimi_params = _tiny_stt()
    info = CheckpointInfo({"model_type": "stt",
                           "stt_config": {"audio_delay_seconds": 0.08,
                                          "audio_silence_prefix_seconds": 0.0},
                           "dep_q": 0, "n_q": 4})
    # CheckpointInfo pops known keys into attrs; lm_config remains
    assert info.model_type == "stt"
    state = InferenceState(info, mimi, mimi_params, lm, lm_params, None,
                           batch_size=1)
    fs = mimi.frame_size
    pcm = (np.random.RandomState(0).randn(1, 1, 4 * fs) * 0.1).astype(np.float32)
    outs = state.run(pcm)
    text_tokens, _ = outs[0]
    assert text_tokens.size >= 3  # one text token per consumed frame


@pytest.mark.parametrize("mimi_chunks", [1, 2])
def test_batched_asr_ws_end_to_end(mimi_chunks):
    """Drives the reference msgpack protocol (asr.rs:15-33): Init/Ready,
    Audio, Marker round-trip with delay alignment, Step messages carrying
    the extra-head probabilities per slot.  mimi_chunks=2 re-runs the whole
    ws surface on the chunked-encoder layout (the B>=512 HBM knob)."""
    aiohttp = pytest.importorskip("aiohttp")
    msgpack = pytest.importorskip("msgpack")
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.asr import StreamingASR
    from moshi_tpu.serve.batched_asr import BatchedAsrState, handle_asr_socket

    lm, lm_params, mimi, mimi_params = _tiny_stt(extra_heads=2)

    class WordyTok:
        def decode(self, ids):
            return "w" + str(len(ids))

    delay = 2
    asr = StreamingASR(mimi, lm, batch_size=2, asr_delay_in_tokens=delay,
                       temperature=0.0, text_tokenizer=WordyTok(),
                       mimi_chunks=mimi_chunks)
    state = BatchedAsrState(asr, mimi_params, lm_params, jax.random.PRNGKey(0))

    async def run():
        app = web.Application()
        app.router.add_get("/api/asr-streaming",
                           lambda r: handle_asr_socket(r, state))
        client = TestClient(TestServer(app))
        await client.start_server()
        loop_task = asyncio.create_task(state.run_loop())
        try:
            ws = await client.ws_connect("/api/asr-streaming")
            msg = await ws.receive()
            assert msg.type == aiohttp.WSMsgType.BINARY, msg
            assert msgpack.unpackb(msg.data) == {"type": "Ready"}

            # Init is answered with another Ready (batched_asr.rs:305-313)
            await ws.send_bytes(msgpack.packb({"type": "Init"}))

            rs = np.random.RandomState(0)
            fs = mimi.frame_size
            got = []

            async def drain(timeout):
                while True:
                    try:
                        m = await asyncio.wait_for(ws.receive(), timeout=timeout)
                    except asyncio.TimeoutError:
                        return
                    if m.type == aiohttp.WSMsgType.BINARY:
                        got.append(msgpack.unpackb(m.data))

            # feed 2 frames, then inject a marker, then more frames
            for i in range(2):
                pcm = (rs.randn(fs) * 0.1).astype(np.float32)
                await ws.send_bytes(msgpack.packb(
                    {"type": "Audio", "pcm": pcm.tolist()}))
                await drain(0.1)
            await ws.send_bytes(msgpack.packb({"type": "Marker", "id": 42}))
            for i in range(delay + 4):
                pcm = (rs.randn(fs) * 0.1).astype(np.float32)
                await ws.send_bytes(msgpack.packb(
                    {"type": "Audio", "pcm": pcm.tolist()}))
                await drain(0.1)
            # the batch step now runs on a worker thread (non-blocking
            # event loop), so the first jit compile can outlast the short
            # drains above — wait until the expected messages arrive
            deadline = asyncio.get_event_loop().time() + 60
            while asyncio.get_event_loop().time() < deadline:
                await drain(0.5)
                kinds_now = [e["type"] for e in got]
                if "Step" in kinds_now and \
                        {"type": "Marker", "id": 42} in got:
                    break
            await ws.close()

            kinds = [e["type"] for e in got]
            # two Ready: on-connect and the Init reply
            assert kinds.count("Ready") == 1  # post-handshake Init reply
            assert "Step" in kinds
            steps = [e for e in got if e["type"] == "Step"]
            assert all(len(e["prs"]) == 2 for e in steps)  # 2 extra heads
            assert all("buffered_pcm" in e and "step_idx" in e for e in steps)
            # the marker came back, aligned after the delay
            assert {"type": "Marker", "id": 42} in got
            midx = got.index({"type": "Marker", "id": 42})
            # marker must not appear before at least `delay` further steps ran
            steps_before = [e for e in got[:midx] if e["type"] == "Step"]
            assert len(steps_before) >= delay
            for e in got:
                assert e["type"] in ("Ready", "Word", "EndWord", "Step",
                                     "Marker"), e
        finally:
            loop_task.cancel()
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
    from moshi_tpu.serve.metrics import TOTAL_STEPS
    assert TOTAL_STEPS.value >= 5


def test_asr_capacity_knobs():
    """The big-batch capacity configuration (int8 KV + bf16 codec +
    quantized weights — BENCH_TTS_ASR.md: bf16 KV OOMs between B=128 and
    B=256 on a 16 GB v5e) drives the same StreamingASR step: state leaves
    carry the requested dtypes, per-slot reset works, and the engine still
    emits word messages."""
    from dataclasses import replace
    from moshi_tpu.models.asr import StreamingASR
    from moshi_tpu.utils.quantize import quantize_lm_params

    lm, lm_params, mimi, mimi_params = _tiny_stt()
    lm_int8 = LMModel(replace(lm.config, kv_cache_dtype="int8", context=16))
    lm_params = quantize_lm_params(lm_params, mode="int8")
    mimi_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, mimi_params)

    class WordyTok:
        def decode(self, ids):
            return "w" + str(len(ids))

    asr = StreamingASR(mimi, lm_int8, batch_size=2, asr_delay_in_tokens=2,
                       temperature=0.0, text_tokenizer=WordyTok(),
                       mimi_dtype=jnp.bfloat16)
    state = asr.init_state(jax.random.PRNGKey(0))
    assert state["transformer"]["k"].dtype == jnp.int8
    assert all(l.dtype != jnp.float32
               for l in jax.tree.leaves(state["mimi"])
               if jnp.issubdtype(l.dtype, jnp.floating))

    rs = np.random.RandomState(0)
    fs = mimi.frame_size
    for _ in range(8):
        pcm = (rs.randn(2, 1, fs) * 0.1).astype(np.float32)
        out, state = asr.step_pcm(mimi_params, lm_params, state, pcm)
    # the word state machines advanced past the delay and are tracking text
    assert all(item.step_idx == 8 for item in asr.items)
    assert all(item.text_token >= 0 for item in asr.items)
    state = asr.reset_batch_idx(state, 0)
    assert asr.items[0].step_idx == 0 and asr.items[1].step_idx == 8
    assert state["transformer"]["k"].dtype == jnp.int8
    pcm = (rs.randn(2, 1, fs) * 0.1).astype(np.float32)
    asr.step_pcm(mimi_params, lm_params, state, pcm)


def test_batched_asr_legacy_framing_still_works():
    """The pre-msgpack byte framing (b"\\x08" + raw f32) keeps working."""
    aiohttp = pytest.importorskip("aiohttp")
    msgpack = pytest.importorskip("msgpack")
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.asr import StreamingASR
    from moshi_tpu.serve.batched_asr import BatchedAsrState, handle_asr_socket

    lm, lm_params, mimi, mimi_params = _tiny_stt()
    asr = StreamingASR(mimi, lm, batch_size=1, asr_delay_in_tokens=2,
                       temperature=0.0)
    state = BatchedAsrState(asr, mimi_params, lm_params, jax.random.PRNGKey(0))

    async def run():
        app = web.Application()
        app.router.add_get("/ws", lambda r: handle_asr_socket(r, state))
        client = TestClient(TestServer(app))
        await client.start_server()
        loop_task = asyncio.create_task(state.run_loop())
        try:
            ws = await client.ws_connect("/ws")
            msg = await ws.receive()
            assert msgpack.unpackb(msg.data) == {"type": "Ready"}
            rs = np.random.RandomState(0)
            fs = mimi.frame_size
            n_events = 0
            for _ in range(6):
                pcm = (rs.randn(fs) * 0.1).astype(np.float32)
                await ws.send_bytes(b"\x08" + pcm.tobytes())
                try:
                    m = await asyncio.wait_for(ws.receive(), timeout=0.2)
                    if m.type == aiohttp.WSMsgType.BINARY:
                        msgpack.unpackb(m.data)
                        n_events += 1
                except asyncio.TimeoutError:
                    pass
            await ws.close()
        finally:
            loop_task.cancel()
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_batched_asr_slot_resume():
    """ASR per-slot resume: a transcription split across a disconnect
    (resumed into a different slot while another tenant dirties the freed
    one) carries both the host word-state clock and the device rows — after
    identical audio, the resumed slot's device state is bit-equal to an
    unbroken reference slot's."""
    from moshi_tpu.models.asr import StreamingASR
    from moshi_tpu.serve.batched_asr import BatchedAsrState

    lm, lm_params, mimi, mimi_params = _tiny_stt()
    asr = StreamingASR(mimi, lm, batch_size=3, asr_delay_in_tokens=2,
                       temperature=0.0, text_tokenizer=None)
    state = BatchedAsrState(asr, mimi_params, lm_params, jax.random.PRNGKey(0))
    fs = state.frame_size
    rs = np.random.RandomState(0)
    frames = [(rs.randn(fs) * 0.1).astype(np.float32) for _ in range(10)]

    async def feed_and_wait(pairs, quiet=0.4, timeout=60.0):
        import time as _time
        for slot, pcm in pairs:
            state.feed_pcm(slot, pcm)
        t0 = _time.time()
        while _time.time() - t0 < timeout:
            await asyncio.sleep(quiet)
            if all(buf.shape[-1] < fs for buf in state.slot_pcm.values()):
                await asyncio.sleep(quiet)  # let the op/step settle
                return
        raise TimeoutError("audio never drained")

    async def scenario():
        loop_task = asyncio.create_task(state.run_loop())
        ref = await state.acquire_slot()   # unbroken reference
        user = await state.acquire_slot()  # drops mid-stream
        first, rest = np.concatenate(frames[:5]), np.concatenate(frames[5:])
        await feed_and_wait([(ref, first), (user, first)])
        assert asr.items[user].step_idx == 5

        rid = state.issue_resume_id(user)
        await state.release_slot(user)

        other = await state.acquire_slot()  # dirties the freed slot
        assert other == user
        await feed_and_wait([(other, np.concatenate(frames[:2]))])
        assert asr.items[other].step_idx == 2  # fresh tenant, reset clock

        back = await state.acquire_slot(resume=rid)
        assert state.slot_resumed[back] is True
        assert back not in (ref, other)
        await asyncio.sleep(0.3)  # restore op applies between frames
        assert asr.items[back].step_idx == 5  # clock carried over

        await feed_and_wait([(ref, rest), (back, rest)])
        assert asr.items[ref].step_idx == 10
        assert asr.items[back].step_idx == 10
        loop_task.cancel()

        # identical audio through split-resume == unbroken: device rows
        # (mimi conv tails + ring KV) bit-equal between the two slots
        a = jax.tree.map(np.asarray,
                         state._extract(state.state, np.int32(ref)))
        b = jax.tree.map(np.asarray,
                         state._extract(state.state, np.int32(back)))
        jax.tree.map(np.testing.assert_array_equal, a, b)

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(scenario())


def test_continuous_conditioner_rust_formula():
    """ContinuousAttributeConditioner matches the reference math
    (rust/moshi-core/src/conditioner.rs:88-110): value * scale_factor ->
    cat(cos, sin) sinusoidal embedding with adim_i = max_period^(-i/(h-1))
    -> output_proj; None values take the learnt padding."""
    from moshi_tpu.conditioners import ContinuousAttributeConditioner

    cond = ContinuousAttributeConditioner(output_dim=10, dim=6,
                                          scale_factor=0.5, max_period=100.0)
    params = cond.init_params(jax.random.PRNGKey(0))
    out, mask = cond.apply(params, cond.prepare([-2.5, None]))
    assert out.shape == (2, 1, 10)

    # independent recompute of the rust formula
    half = 3
    pos = -2.5 * 0.5
    adim = 1.0 / 100.0 ** (np.arange(half) / (half - 1))
    emb = np.concatenate([np.cos(pos * adim), np.sin(pos * adim)])
    want = emb @ np.asarray(params["output_proj"])
    np.testing.assert_allclose(np.asarray(out)[0, 0], want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[1:2],
                               np.asarray(params["learnt_padding"]))
    assert mask.tolist() == [[True], [False]]


def test_asr_sum_condition_modes():
    """asr_sum_condition mirrors the reference server's checkpoint contract
    (moshi-server/src/asr.rs:55-67, batched_asr.rs:197-213): a checkpoint
    with a `delay` conditioner requires exactly one of conditioning_delay /
    learnt_padding; one without rejects both."""
    from moshi_tpu.conditioners import (ContinuousAttributeConditioner,
                                        ConditionProvider)
    from moshi_tpu.models.asr import asr_sum_condition

    dim = 8
    cond = ContinuousAttributeConditioner(output_dim=dim, dim=4,
                                          scale_factor=1.0, max_period=10.0)
    params = {"delay": cond.init_params(jax.random.PRNGKey(1))}

    class InfoWith:
        def get_conditioners(self, output_dim):
            assert output_dim == dim
            return ConditionProvider({"delay": cond}), None, params

    class InfoWithout:
        def get_conditioners(self, output_dim):
            return None, None, None

    out = asr_sum_condition(InfoWith(), dim, conditioning_delay=2.0)
    assert out.shape == (1, 1, dim)
    # the value fed is NEGATED (condition_cont("delay", -delay), asr.rs:62)
    want, _ = cond.apply(params["delay"], cond.prepare([-2.0]))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    pad = asr_sum_condition(InfoWith(), dim, learnt_padding=True)
    np.testing.assert_array_equal(
        np.asarray(pad), np.asarray(params["delay"]["learnt_padding"]))

    with pytest.raises(ValueError):  # both set (batched_asr.rs:209)
        asr_sum_condition(InfoWith(), dim, conditioning_delay=1.0,
                          learnt_padding=True)
    with pytest.raises(ValueError):  # conditioner present, nothing set
        asr_sum_condition(InfoWith(), dim)
    with pytest.raises(ValueError):  # no conditioner but conditioning asked
        asr_sum_condition(InfoWithout(), dim, conditioning_delay=1.0)
    assert asr_sum_condition(InfoWithout(), dim) is None


def test_streaming_asr_applies_sum_condition():
    """The per-step condition is added to the temporal input exactly like
    the reference AddToInput sum (lm.rs forward_cond): conditioned device
    step == unconditioned step on params whose condition is pre-folded,
    and != the unconditioned step."""
    from moshi_tpu.models.asr import StreamingASR

    lm, lm_params, mimi, mimi_params = _tiny_stt()
    cond = (np.arange(lm.config.dim, dtype=np.float32) % 5 - 2).reshape(1, 1, -1) * 0.1

    asr_c = StreamingASR(mimi, lm, batch_size=1, asr_delay_in_tokens=2,
                         temperature=0.0, sum_condition=cond)
    asr_p = StreamingASR(mimi, lm, batch_size=1, asr_delay_in_tokens=2,
                         temperature=0.0)
    state_c = asr_c.init_state(jax.random.PRNGKey(0))
    state_p = asr_p.init_state(jax.random.PRNGKey(0))

    rs = np.random.RandomState(3)
    fs = mimi.frame_size
    toks_c, toks_p = [], []
    for _ in range(6):
        pcm = (rs.randn(1, 1, fs) * 0.1).astype(np.float32)
        _, state_c = asr_c.step_pcm(mimi_params, lm_params, state_c, pcm)
        _, state_p = asr_p.step_pcm(mimi_params, lm_params, state_p, pcm)
        toks_c.append(asr_c.items[0].text_token)
        toks_p.append(asr_p.items[0].text_token)
    # conditioning changes the text stream (tiny random model, any nonzero
    # input shift moves argmax somewhere over 6 steps)
    assert toks_c != toks_p


def test_asr_mimi_chunks_parity():
    """mimi_chunks=2 (the B>=512 HBM knob, BENCH_TTS_ASR.md) is a pure
    scheduling change: the text stream, per-slot resets, and single-slot
    snapshot rows match the unchunked layout.  Mimi rows are compared to
    float tolerance (chunking changes the encoder's XLA batch shape, so
    conv accumulation order may differ at the last ULP); the LM rows and
    all emitted tokens must be exact."""
    from moshi_tpu.models.asr import StreamingASR

    lm, lm_params, mimi, mimi_params = _tiny_stt()
    asr1 = StreamingASR(mimi, lm, batch_size=4, asr_delay_in_tokens=2,
                        temperature=0.0, mimi_chunks=1)
    asr2 = StreamingASR(mimi, lm, batch_size=4, asr_delay_in_tokens=2,
                        temperature=0.0, mimi_chunks=2)
    s1 = asr1.init_state(jax.random.PRNGKey(0))
    s2 = asr2.init_state(jax.random.PRNGKey(0))
    assert isinstance(s2["mimi"], tuple) and len(s2["mimi"]) == 2

    fs = mimi.frame_size
    rs = np.random.RandomState(0)
    for t in range(6):
        pcm = (rs.randn(4, 1, fs) * 0.1).astype(np.float32)
        em = np.array([True, True, t % 2 == 0, True])
        m1, s1 = asr1.step_pcm(mimi_params, lm_params, s1, pcm, exec_mask=em)
        m2, s2 = asr2.step_pcm(mimi_params, lm_params, s2, pcm, exec_mask=em)
        assert [type(m).__name__ for m in m1] == [type(m).__name__ for m in m2]
        assert ([i.text_token for i in asr1.items]
                == [i.text_token for i in asr2.items])
        if t == 3:
            s1 = asr1.reset_batch_idx(s1, 1)
            s2 = asr2.reset_batch_idx(s2, 1)

    # single-slot snapshot rows agree across layouts for every slot,
    # including slots in the second chunk (host-routed chunk selection)
    for slot in range(4):
        r1 = jax.tree.map(np.asarray, asr1.extract_slot_arrays(s1, slot))
        r2 = jax.tree.map(np.asarray, asr2.extract_slot_arrays(s2, slot))
        jax.tree.map(np.testing.assert_array_equal, r1[1], r2[1])  # LM rows
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            a.astype(np.float32), b.astype(np.float32), rtol=1e-5, atol=1e-6),
            r1[0], r2[0])

    # restore round-trip on the chunked layout (slot 3 lives in chunk 1):
    # copying slot 3's rows into slot 0 makes extract(0) == extract(3)
    rows = asr2.extract_slot_arrays(s2, 3)
    s2 = asr2.restore_slot_arrays(s2, rows, 0)
    a = jax.tree.map(np.asarray, asr2.extract_slot_arrays(s2, 0))
    b = jax.tree.map(np.asarray, asr2.extract_slot_arrays(s2, 3))
    jax.tree.map(np.testing.assert_array_equal, a, b)
