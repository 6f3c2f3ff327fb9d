"""gguf checkpoint format: reader/writer round-trip and end-to-end loading
of a tiny LM through `get_moshi_lm` (VERDICT r2 ask #4 — the rust
ecosystem's quantized format, `rust/moshi-core/src/lm.rs:1009-1031`)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from test_lm import tiny_lm_config
from moshi_tpu.models.lm import LMModel
from moshi_tpu.models.gguf import read_gguf, write_gguf


def test_gguf_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    tensors = {
        "a.weight": rs.randn(8, 64).astype(np.float32),
        "b.weight": rs.randn(3, 5).astype(np.float32),
        "c.bias": rs.randn(7).astype(np.float32),
    }
    path = tmp_path / "t.gguf"
    write_gguf(path, tensors, metadata={"general.architecture": "moshi",
                                        "x.flag": True, "x.n": 3},
               quantize={"a.weight"})
    meta, got = read_gguf(path)
    assert meta["general.architecture"] == "moshi"
    assert meta["x.flag"] is True and meta["x.n"] == 3
    assert set(got) == set(tensors)
    np.testing.assert_allclose(got["b.weight"], tensors["b.weight"])
    np.testing.assert_allclose(got["c.bias"], tensors["c.bias"])
    # q8_0 is lossy: per-32-block scale, |err| <= d/2
    a = tensors["a.weight"]
    d = np.abs(a.reshape(-1, 32)).max(1, keepdims=True) / 127.0
    assert np.abs(got["a.weight"] - a).max() <= (d.max() / 2 + 1e-7)
    assert got["a.weight"].shape == a.shape


def test_gguf_lm_end_to_end(tmp_path):
    """A tiny LM exported to gguf (q8_0 linears) loads through get_moshi_lm
    and produces a close forward pass vs the safetensors original."""
    import export_torch
    from safetensors.numpy import save_file
    from moshi_tpu.models.loaders import get_moshi_lm

    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    state = export_torch.lm_params_to_torch_state(model, params)
    state_np = {k: np.ascontiguousarray(np.asarray(v, np.float32))
                for k, v in state.items()}

    st_path = tmp_path / "model.safetensors"
    save_file(state_np, str(st_path))
    gg_path = tmp_path / "model.gguf"
    quantize = {k for k, v in state_np.items()
                if v.ndim >= 2 and "emb" not in k and v.shape[-1] % 32 == 0}
    assert quantize, "tiny config should have quantizable linears"
    write_gguf(gg_path, state_np, quantize=quantize)

    cfg_dict = {f: getattr(cfg, f) for f in (
        "dim", "text_card", "n_q", "dep_q", "card", "num_heads", "num_layers",
        "hidden_scale", "causal", "context", "gating", "norm",
        "positional_embedding", "depformer_dim", "depformer_num_heads",
        "depformer_num_layers", "depformer_dim_feedforward")}
    cfg_dict["delays"] = list(cfg.delays)

    m1, p1 = get_moshi_lm(st_path, dict(cfg_dict), dtype=jnp.float32)
    m2, p2 = get_moshi_lm(gg_path, dict(cfg_dict), dtype=jnp.float32)

    codes = jax.random.randint(jax.random.PRNGKey(1),
                               (1, cfg.num_codebooks, 6), 0, cfg.card)
    o1 = m1.forward(p1, codes)
    o2 = m2.forward(p2, codes)
    a, b = np.asarray(o1["text_logits"]), np.asarray(o2["text_logits"])
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, rel
