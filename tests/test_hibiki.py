"""Hibiki (speech translation) paths on a synthetic checkpoint.

The released Hibiki checkpoint is not available in this environment, so
these tests exercise every hibiki-specific code path with random weights:
the EOS->PAD embedding hack (reference loaders.py:308-313), the
description-LUT CFG conditioning that run_inference builds from the config
(reference run_inference.py:34-57), and the end-of-stream injection loop
(reference run_inference.py:143-160).
"""

import json
import shutil

import numpy as np
import pytest

from test_server import tiny_checkpoint  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def hibiki_checkpoint(tiny_checkpoint, tmp_path_factory):
    torch = pytest.importorskip("torch")
    from safetensors.torch import load_file, save_file

    root = tmp_path_factory.mktemp("hibiki_ckpt")
    for f in tiny_checkpoint.iterdir():
        shutil.copy(f, root / f.name)
    cfg = json.loads((root / "config.json").read_text())
    cfg["model_type"] = "hibiki"
    # the released hibiki config shape: a "description" LUT conditioner with
    # enum values, sum-fused into the transformer input
    cfg["conditioners"] = {"description": {"type": "lut", "lut": {
        "n_bins": 2, "dim": 8, "tokenizer": "noop",
        "possible_values": ["very_bad", "very_good"]}}}
    cfg["fuser"] = {"sum": ["description"], "cross": []}
    (root / "config.json").write_text(json.dumps(cfg))
    # conditioner weights live in the moshi safetensors under torch names
    state = load_file(str(root / "model.safetensors"))
    torch.manual_seed(1)
    prefix = "condition_provider.conditioners.description"
    state[f"{prefix}.embed.weight"] = torch.randn(3, 8)
    state[f"{prefix}.output_proj.weight"] = torch.randn(32, 8) * 0.2
    state[f"{prefix}.learnt_padding"] = torch.randn(1, 1, 32) * 0.2
    save_file(state, str(root / "model.safetensors"))
    return root


def test_hibiki_eos_pad_embedding_hack(hibiki_checkpoint):
    import jax.numpy as jnp
    from moshi_tpu.models.loaders import CheckpointInfo

    info = CheckpointInfo.from_dir(hibiki_checkpoint)
    assert info.model_type == "hibiki"
    _, params = info.get_moshi(dtype=jnp.float32)
    w = np.asarray(params["text_emb"]["weight"])
    np.testing.assert_array_equal(w[2], w[3])  # EOS embeds as PAD
    assert not np.array_equal(w[2], w[4])


def test_hibiki_conditioners_load(hibiki_checkpoint):
    from moshi_tpu.models.loaders import CheckpointInfo

    info = CheckpointInfo.from_dir(hibiki_checkpoint)
    provider, fuser, cp_params = info.get_conditioners(32)
    assert provider is not None and fuser is not None
    assert fuser.fuse2cond["sum"] == ["description"]
    p = cp_params["description"]
    assert p["embed"].shape == (3, 8)
    assert p["output_proj"].shape == (8, 32)  # transposed from torch layout
    assert p["learnt_padding"].shape == (1, 1, 32)
    # enum lookup rejects unknown values (reference NoopTokenizer enum mode)
    with pytest.raises(ValueError):
        provider.conditioners["description"].prepare(["excellent"])


@pytest.mark.parametrize("cfg_coef", [1.0, 2.0])
def test_hibiki_run_inference(hibiki_checkpoint, cfg_coef):
    """Full hibiki offline loop: conditioned LM steps, EOS-frame injection
    after the input ends, silence continuation until text EOS (or the safety
    cap — random weights may not sample EOS quickly)."""
    import jax.numpy as jnp
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.run_inference import InferenceState

    info = CheckpointInfo.from_dir(hibiki_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)
    provider, fuser, cp_params = info.get_conditioners(lm.config.dim)

    B = 2
    state = InferenceState(info, mimi, mimi_params, lm, lm_params, None, B,
                           cfg_coef=cfg_coef, condition_provider=provider,
                           condition_provider_params=cp_params, fuser=fuser,
                           **info.lm_gen_config)
    # hibiki conditioning reached the LM input: [B,1,D] (2B under CFG)
    assert state.condition_sum is not None
    expect_b = B if cfg_coef == 1.0 else 2 * B
    assert state.condition_sum.shape == (expect_b, 1, lm.config.dim)

    fs = mimi.frame_size
    rs = np.random.RandomState(0)
    in_pcms = (rs.randn(B, 1, 4 * fs) * 0.1).astype(np.float32)
    outs = state.run(in_pcms, max_steps=48)
    assert len(outs) == B
    text_tokens, out_pcm = outs[0]
    # text and audio stay frame-aligned through the eos-injection loop
    assert out_pcm.shape[-1] == text_tokens.shape[0] * fs
    assert text_tokens.shape[0] >= 1
