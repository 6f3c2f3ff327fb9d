"""Repetition penalty, rustymimi-analog Tokenizer facade, native checkpoint
roundtrip."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from test_lm import tiny_lm_config
from test_server import tiny_checkpoint  # noqa: F401 (fixture)
from test_mimi import tiny_mimi_config


def test_text_repetition_penalty_discourages_repeats():
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig

    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    B, T = 1, 12
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, n_in, T), 0, cfg.card)

    def run(gcfg):
        gen = LMGen(model, gcfg)
        st = gen.init_state(B, jax.random.PRNGKey(2), dtype=jnp.float32)
        outs = []
        for t in range(T):
            o, st = gen.step(params, st, tokens[:, :, t:t + 1])
            outs.append(int(np.asarray(o)[0, 0, 0]))
        return outs, st

    base, _ = run(LMGenConfig(use_sampling=False))
    pen, st = run(LMGenConfig(use_sampling=False, text_rep_penalty=1e6,
                              text_rep_context=16))
    assert "text_history" in st
    # with an extreme penalty, a greedy stream cannot emit the same non-pad
    # token twice within the window
    nonpad = [t for t in pen if t not in (-2, 0, 3, cfg.text_card)]
    assert len(nonpad) == len(set(nonpad)), nonpad
    # and the streams genuinely differ if the base repeated anything
    base_nonpad = [t for t in base if t not in (-2, 0, 3, cfg.text_card)]
    if len(base_nonpad) != len(set(base_nonpad)):
        assert base != pen


def test_mimi_tokenizer_facade():
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.serve.mimi_ws import Tokenizer

    mimi = MimiModel(tiny_mimi_config())
    params = mimi.init_params(jax.random.PRNGKey(0))
    tok = Tokenizer(mimi, params)
    fs = mimi.frame_size
    pcm = np.random.RandomState(0).randn(1, 1, 4 * fs).astype(np.float32) * 0.2
    codes = tok.encode(pcm)
    audio = tok.decode(codes)
    assert audio.shape[-1] == 4 * fs
    # streaming steps match offline
    tok.reset()
    s1 = tok.encode_step(pcm[:, :, :2 * fs])
    s2 = tok.encode_step(pcm[:, :, 2 * fs:])
    np.testing.assert_array_equal(np.concatenate([s1, s2], axis=2), codes)


def test_native_ckpt_roundtrip():
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.native_ckpt import save_params, load_params
    from moshi_tpu.utils.quantize import quantize_lm_params, QTensor
    import tempfile, os

    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = quantize_lm_params(
        model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32), min_size=1)
    with tempfile.NamedTemporaryFile(suffix=".safetensors", delete=False) as f:
        path = f.name
    try:
        save_params(path, params)
        loaded = load_params(path)
        flat_a = jax.tree.leaves(params)
        flat_b = jax.tree.leaves(loaded)
        assert len(flat_a) == len(flat_b)
        assert isinstance(loaded["transformer"]["layers"]["attn"]["in_proj"], QTensor)
        np.testing.assert_array_equal(
            np.asarray(params["transformer"]["layers"]["attn"]["in_proj"].q),
            np.asarray(loaded["transformer"]["layers"]["attn"]["in_proj"].q))
        np.testing.assert_array_equal(np.asarray(params["emb"]["weight"]),
                                      np.asarray(loaded["emb"]["weight"]))
    finally:
        os.unlink(path)


def test_native_ckpt_empty_nodes_and_q4():
    """Empty dict/list entries (Mimi's output_projs=[{}] when d_model equals
    the seanet dimension) and QTensor4 leaves must round-trip."""
    from moshi_tpu.models.native_ckpt import save_params, load_params
    from moshi_tpu.utils.quantize import quantize_tensor4, QTensor4
    import tempfile, os

    w = jnp.asarray(np.random.RandomState(0).randn(64, 8), jnp.float32)
    tree = {
        "output_projs": [{}, {"weight": jnp.ones((4, 4))}, {}],
        "empty_list": [],
        "nested": {"empty": {}, "q4": quantize_tensor4(w)},
    }
    with tempfile.NamedTemporaryFile(suffix=".safetensors", delete=False) as f:
        path = f.name
    try:
        save_params(path, tree)
        loaded = load_params(path)
        assert loaded["output_projs"][0] == {}
        assert loaded["output_projs"][2] == {}
        np.testing.assert_array_equal(
            np.asarray(tree["output_projs"][1]["weight"]),
            np.asarray(loaded["output_projs"][1]["weight"]))
        assert loaded["empty_list"] == []
        assert loaded["nested"]["empty"] == {}
        assert isinstance(loaded["nested"]["q4"], QTensor4)
        np.testing.assert_array_equal(np.asarray(tree["nested"]["q4"].q),
                                      np.asarray(loaded["nested"]["q4"].q))
    finally:
        os.unlink(path)


def test_native_ckpt_mimi_roundtrip():
    """A full Mimi param tree (which contains empty output_projs entries)
    must survive save/load (ADVICE r1: export was unreadable)."""
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.models.native_ckpt import save_params, load_params
    import tempfile, os

    mimi = MimiModel(tiny_mimi_config())
    params = mimi.init_params(jax.random.PRNGKey(0))
    with tempfile.NamedTemporaryFile(suffix=".safetensors", delete=False) as f:
        path = f.name
    try:
        save_params(path, params)
        loaded = load_params(path)
        fs = mimi.frame_size
        pcm = jnp.asarray(np.random.RandomState(0).randn(1, 1, 2 * fs) * 0.1,
                          jnp.float32)
        np.testing.assert_array_equal(np.asarray(mimi.encode(params, pcm)),
                                      np.asarray(mimi.encode(loaded, pcm)))
    finally:
        os.unlink(path)


def test_printer_wrapping_and_lag():
    """Boxed word-wrap printer (client_utils.py:127-216 behavior)."""
    import io
    from moshi_tpu.client_utils import Printer, RawPrinter, make_printer

    buf = io.StringIO()
    p = Printer(max_cols=12, stream=buf, err_stream=io.StringIO())
    p.print_header()
    for tok in [" hello", " world", " again", " and", " more"]:
        p.print_token(tok)
    p.print_lag()
    p.print_lag()  # only one marker per episode
    p.clear_lag()
    p.print_lag()
    p.close()
    out = buf.getvalue()
    lines = out.splitlines()
    assert lines[0].strip().startswith("-")
    body = [ln for ln in lines if ln.startswith("| ")]
    assert all(ln.endswith(" |") for ln in body)
    assert all(len(ln) <= 12 + 4 + 12 for ln in body)  # cols + borders + ansi
    assert out.count("[LAG]") == 2
    assert "\x1b[31m" in out  # red

    # long unbroken token hard-splits
    buf2 = io.StringIO()
    p2 = Printer(max_cols=8, stream=buf2, err_stream=io.StringIO())
    p2.print_header()
    p2.print_token("abcdefghijklmnop")
    p2.close()
    assert "abcdefgh" in buf2.getvalue()

    # non-tty -> RawPrinter
    assert isinstance(make_printer(io.StringIO()), RawPrinter)


def test_client_gradio_import_gated():
    """client_gradio imports without the optional gradio extras and fails
    with a clear ImportError only at main() (reference client_gradio.py
    raises at import time; ours stays importable for inventory/CI)."""
    import sys
    import moshi_tpu.client_gradio as cg

    if cg._IMPORT_ERROR is None:
        import pytest
        pytest.skip("gradio extras installed; gating not exercised")
    argv = sys.argv
    sys.argv = ["client_gradio", "--url", "http://localhost:8998"]
    try:
        import pytest
        with pytest.raises(ImportError, match="gradio"):
            cg.main()
    finally:
        sys.argv = argv


def test_cli_client_end_to_end(tiny_checkpoint, tmp_path):
    """The file-based CLI client against a live server: opus up, opus +
    text down, paced at rt_factor, output wav written."""
    pytest.importorskip("aiohttp")
    import asyncio
    import numpy as np
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState
    from moshi_tpu import audio, client

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)

    class _Tok:
        def id_to_piece(self, t):
            return f"w{t}"

    state = ServerState(info, mimi, mimi_params, lm, lm_params, _Tok(),
                        **info.lm_gen_config)
    state.warmup()

    rs = np.random.RandomState(0)
    in_wav = tmp_path / "in.wav"
    out_wav = tmp_path / "out.wav"
    audio.write_wav(in_wav, (rs.randn(1920 * 8) * 0.05).astype(np.float32),
                    24000)

    async def scenario():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        srv = TestServer(app)
        await srv.start_server()
        try:
            url = f"ws://127.0.0.1:{srv.port}/api/chat"
            return await client.run(url, str(in_wav), str(out_wav),
                                    rt_factor=8.0)
        finally:
            await srv.close()

    text = asyncio.get_event_loop_policy().new_event_loop() \
        .run_until_complete(scenario())
    assert isinstance(text, str)
    assert out_wav.exists(), "no audio received/written"
    loaded, sr = audio.read_wav(out_wav)
    assert sr == 24000 and loaded.shape[-1] >= 1920


def test_ci_lists_every_test_file():
    """Every tests/test_*.py must appear in ci.yml — a file CI never runs is
    how round 4 shipped a red test without noticing."""
    import pathlib
    root = pathlib.Path(__file__).resolve().parent.parent
    ci = (root / ".github" / "workflows" / "ci.yml").read_text()
    missing = [p.name for p in sorted((root / "tests").glob("test_*.py"))
               if p.name not in ci]
    assert not missing, f"test files not listed in CI: {missing}"


def test_tui_render_lines_layout():
    """client_tui.render_lines (the pure layout of the moshi-cli-style TUI,
    multistream.rs:221-420): header state + level bar, received/sent stat
    panels, wrapped transcript, logs, key footer."""
    from moshi_tpu.client_tui import TuiState, render_lines, _wrap

    st = TuiState()
    st.on_sent(np.ones(1920, np.float32) * 0.5)
    st.on_audio(np.zeros(3840, np.float32))
    st.on_text(" hello")
    st.on_text(" world,")
    st.on_text(" this transcript is long enough to wrap across lines")
    st.log("info", "connected")
    st.lag = True

    lines = render_lines(st, width=100, height=24)
    txt = {(y, x): t for y, x, t, _ in lines}
    flat = " | ".join(t for _, _, t, _ in lines)
    assert "moshi_tpu" in flat and "Quit <Q>" in flat
    assert "RUNNING" in flat
    assert "mic " in flat and "#" in flat          # level bar has energy
    assert "audio msgs: 1" in flat                  # received panel
    assert "play len: 3840 (0.2s)" in flat
    assert "sent len: 1920 (0.1s)" in flat
    assert "lag: YES" in flat
    assert "hello world," in flat
    assert "[info] connected" in flat
    # every row stays inside the frame
    assert all(x + len(t) <= 100 for _, x, t, _ in lines), "overflow"
    # transcript wrapping is stable and bounded
    wrapped = _wrap(st.subs, 20, 3)
    assert len(wrapped) <= 3 and all(len(w) <= 20 for w in wrapped)
    st.state = "EXITING"
    flat2 = " | ".join(t for _, _, t, _ in render_lines(st, 100, 24))
    assert "EXITING" in flat2


def test_tui_client_end_to_end(tiny_checkpoint, tmp_path, monkeypatch):
    """The TUI client loop runs against a real tiny server (fake curses
    screen): stats accumulate, the transcript fills, audio is written."""
    import asyncio
    pytest.importorskip("aiohttp")
    from aiohttp import web
    from aiohttp.test_utils import TestServer
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState
    from moshi_tpu import audio, client_tui
    import curses

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)

    class _Tok:
        def id_to_piece(self, t):
            return f"w{t}"

    state = ServerState(info, mimi, mimi_params, lm, lm_params, _Tok(),
                        **info.lm_gen_config)
    state.warmup()

    rs = np.random.RandomState(0)
    in_wav = tmp_path / "in.wav"
    out_wav = tmp_path / "out.wav"
    audio.write_wav(in_wav, (rs.randn(1920 * 8) * 0.05).astype(np.float32),
                    24000)

    class FakeScreen:
        def __init__(self):
            self.frames = 0

        def nodelay(self, flag):
            pass

        def getch(self):
            return -1

        def erase(self):
            pass

        def getmaxyx(self):
            return (24, 100)

        def addstr(self, y, x, text, attr=0):
            pass

        def refresh(self):
            self.frames += 1

    for fn in ("curs_set", "start_color", "use_default_colors", "init_pair"):
        monkeypatch.setattr(curses, fn, lambda *a, **k: None)
    monkeypatch.setattr(curses, "color_pair", lambda n: 0)
    scr = FakeScreen()

    async def scenario():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        srv = TestServer(app)
        await srv.start_server()
        try:
            url = f"ws://127.0.0.1:{srv.port}/api/chat"
            return await client_tui.run_tui(scr, url, str(in_wav),
                                            str(out_wav), rt_factor=8.0)
        finally:
            await srv.close()

    again, text = asyncio.get_event_loop_policy().new_event_loop() \
        .run_until_complete(scenario())
    assert again is False
    assert isinstance(text, str)
    assert scr.frames > 0, "the UI never drew"
    assert out_wav.exists()
