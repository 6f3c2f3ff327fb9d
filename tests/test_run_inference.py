"""Offline batched inference runner on the tiny checkpoint: full-duplex mode
produces aligned text + audio; output wav writing works."""

import numpy as np
import pytest

from test_server import tiny_checkpoint  # noqa: F401 (fixture)


def test_run_inference_full_duplex(tiny_checkpoint, tmp_path):
    import jax.numpy as jnp
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.run_inference import InferenceState
    from moshi_tpu import audio

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)

    B = 2
    state = InferenceState(info, mimi, mimi_params, lm, lm_params, None, B,
                           **info.lm_gen_config)
    fs = mimi.frame_size
    rs = np.random.RandomState(0)
    pcm = (rs.randn(1, 1, 6 * fs) * 0.1).astype(np.float32)
    in_pcms = np.broadcast_to(pcm, (B, 1, pcm.shape[-1])).copy()

    texts = []
    outs = state.run(in_pcms, on_text=texts.append)
    assert len(outs) == B
    text_tokens, out_pcm = outs[0]
    assert out_pcm.shape[0] == 1
    # delays max 2 -> first 2 frames skipped; 6 in -> ~4 out frames
    assert out_pcm.shape[-1] == text_tokens.shape[0] * fs
    assert text_tokens.shape[0] >= 3
    # both batch items identical inputs -> identical outputs (shared rng? no —
    # rng is shared across the batch, sampling per item; check shapes only)
    out_path = tmp_path / "out.wav"
    audio.write_wav(out_path, out_pcm[0], mimi.sample_rate)
    loaded, sr = audio.read_wav(out_path)
    assert sr == mimi.sample_rate
    assert loaded.shape[-1] == out_pcm.shape[-1]
