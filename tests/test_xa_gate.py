"""Cross-attention gating zoo (XaGate) and 2025 model presets.

Behavioral reference: rust/moshi-core/src/transformer.rs:96-186 (gate
formulas), lm.rs:81-433 (preset configs).  Gate numerics are checked against
a direct torch re-implementation of the rust formulas; wiring is checked by
closed/open-gate limits and a loader round-trip through rust-style weight
names.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.modules.transformer import TransformerConfig, StreamingTransformer

GATES = ["constant_gated_tanh", "constant_gated_sigmoid",
         "conditional_gated_tanh", "conditional_gated_sigmoid",
         "conditional_gated_tanh_learnable_bias",
         "conditional_gated_sigmoid_learnable_bias"]


def _cfg(gating="normal", shared=False, kv_dim=None, layers=2):
    return TransformerConfig(
        d_model=32, num_heads=2, num_layers=layers, dim_feedforward=128,
        causal=True, context=16, positional_embedding="rope", gating="silu",
        norm="rms_norm_f32", cross_attention=True,
        cross_attention_gating=gating, cross_attention_norm="rms_norm_f32",
        cross_attention_kv_dim=kv_dim, shared_cross_attn=shared)


@pytest.mark.parametrize("gate", GATES)
def test_gate_formula_matches_torch(gate):
    """_apply_xa_gate vs a torch re-implementation of XaGate::forward
    (transformer.rs:166-186)."""
    torch = pytest.importorskip("torch")
    cfg = _cfg(gate)
    tr = StreamingTransformer(cfg)
    rs = np.random.RandomState(0)
    x = rs.randn(2, 5, cfg.d_model).astype(np.float32)

    if gate.startswith("constant"):
        params = {"alpha": jnp.asarray(rs.randn(1, 1, 1).astype(np.float32))}
        xt = torch.from_numpy(x)
        a = torch.from_numpy(np.asarray(params["alpha"]))
        if gate.endswith("tanh"):
            y_ref = (xt * a.tanh()).numpy()
        else:
            y_ref = (xt * torch.sigmoid(a - 4.0)).numpy()
    else:
        h = cfg.xa_gate_hidden
        assert h == int(0.125 * cfg.d_model)
        params = {"in_proj": jnp.asarray(rs.randn(cfg.d_model, h).astype(np.float32)),
                  "out_proj": jnp.asarray(rs.randn(h, cfg.d_model).astype(np.float32))}
        if gate.endswith("learnable_bias"):
            params["bias"] = jnp.asarray(rs.randn(cfg.d_model).astype(np.float32))
        xt = torch.from_numpy(x)
        w_in = torch.from_numpy(np.asarray(params["in_proj"]))
        w_out = torch.from_numpy(np.asarray(params["out_proj"]))
        a = (xt @ w_in).relu() @ w_out
        if "bias" in params:
            a = a + torch.from_numpy(np.asarray(params["bias"]))
        if "tanh" in gate:
            a = a.tanh()
        elif gate.endswith("learnable_bias"):
            a = torch.sigmoid(a)
        else:
            a = torch.sigmoid(a - 4.0)
        y_ref = (xt * a).numpy()

    y = tr._apply_xa_gate(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-6, atol=1e-6)


def test_constant_gate_limits():
    """alpha=0 closes the tanh gate (cross contribution vanishes); a large
    sigmoid alpha opens it (output == ungated model)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 6, 32).astype(np.float32))
    src = jnp.asarray(rs.randn(2, 4, 32).astype(np.float32))

    cfg_g = _cfg("constant_gated_tanh")
    tr_g = StreamingTransformer(cfg_g)
    params = tr_g.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    assert params["layers"]["cross_attn_gate"]["alpha"].shape == (2, 1, 1, 1)

    # closed gate (alpha=0 -> tanh=0): equal to a transformer whose cross
    # branch contributes nothing -> compare against no-cross forward.
    y_closed = tr_g.apply(params, x, cross_src=src)
    cfg_plain = TransformerConfig(
        d_model=32, num_heads=2, num_layers=2, dim_feedforward=128,
        causal=True, context=16, positional_embedding="rope", gating="silu",
        norm="rms_norm_f32")
    tr_plain = StreamingTransformer(cfg_plain)
    plain_params = {"layers": {k: v for k, v in params["layers"].items()
                               if not k.startswith("cross_attn") and k != "norm_cross"}}
    y_plain = tr_plain.apply(plain_params, x)
    np.testing.assert_allclose(np.asarray(y_closed), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-5)

    # open gate: sigmoid(alpha - 4) ~ 1 for alpha = 30 -> equals ungated
    cfg_s = _cfg("constant_gated_sigmoid")
    tr_s = StreamingTransformer(cfg_s)
    params_open = jax.tree.map(lambda v: v, params)
    params_open["layers"]["cross_attn_gate"] = {
        "alpha": jnp.full((2, 1, 1, 1), 30.0, jnp.float32)}
    y_open = tr_s.apply(params_open, x, cross_src=src)
    cfg_n = _cfg("normal")
    tr_n = StreamingTransformer(cfg_n)
    params_n = {"layers": {k: v for k, v in params["layers"].items()
                           if k != "cross_attn_gate"}}
    y_normal = tr_n.apply(params_n, x, cross_src=src)
    np.testing.assert_allclose(np.asarray(y_open), np.asarray(y_normal),
                               rtol=1e-5, atol=1e-5)


def test_shared_cross_attn_equals_replicated():
    """shared_cross_attn (weights outside the [L] stack) == a non-shared
    model whose per-layer cross weights are all identical."""
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 6, 32).astype(np.float32))
    src = jnp.asarray(rs.randn(2, 4, 32).astype(np.float32))

    cfg_sh = _cfg("conditional_gated_sigmoid", shared=True)
    tr_sh = StreamingTransformer(cfg_sh)
    p_sh = tr_sh.init_params(jax.random.PRNGKey(3), dtype=jnp.float32)
    assert "cross_attn_shared" in p_sh
    assert "cross_attn" not in p_sh["layers"]
    assert p_sh["layers"]["cross_attn_gate"]["in_proj"].shape[0] == 2

    cfg_ns = _cfg("conditional_gated_sigmoid", shared=False)
    tr_ns = StreamingTransformer(cfg_ns)
    p_ns = {"layers": dict(p_sh["layers"])}
    p_ns["layers"]["cross_attn"] = jax.tree.map(
        lambda v: jnp.broadcast_to(v, (2,) + v.shape), p_sh["cross_attn_shared"])

    y_sh = tr_sh.apply(p_sh, x, cross_src=src)
    y_ns = tr_ns.apply(p_ns, x, cross_src=src)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ns),
                               rtol=1e-5, atol=1e-5)

    # streaming parity: precomputed shared KV has no layer axis
    cross = tr_sh.precompute_cross(p_sh, src)
    assert cross["k_cross"].ndim == 4
    state = tr_sh.init_state(2, dtype=jnp.float32)
    state.update(cross)
    ys = []
    for t in range(x.shape[1]):
        yt, state = tr_sh.step(p_sh, state, x[:, t:t + 1])
        ys.append(yt)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(ys, axis=1)),
                               np.asarray(y_sh), rtol=1e-4, atol=1e-4)


def test_cross_attention_kv_dim():
    """Cross source with a different dimension than d_model
    (rust kv_in_dim, transformer.rs:238-247)."""
    cfg = _cfg("normal", kv_dim=48)
    tr = StreamingTransformer(cfg)
    p = tr.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    assert p["layers"]["cross_attn"]["kv_proj"].shape == (2, 48, 64)
    x = jnp.zeros((1, 3, 32))
    src = jnp.ones((1, 5, 48))
    y = tr.apply(p, x, cross_src=src)
    assert y.shape == (1, 3, 32)
    assert bool(jnp.isfinite(y).all())


def test_loader_rust_style_cross_attn_roundtrip():
    """transformer_layers_from_torch must parse rust-style separate
    in_proj_weight_q / in_proj_weight_kv and gate.alpha.* names into the
    same arrays init_params produces."""
    from moshi_tpu.models.loaders import transformer_layers_from_torch

    cfg = _cfg("conditional_gated_sigmoid_learnable_bias")
    tr = StreamingTransformer(cfg)
    p = tr.init_params(jax.random.PRNGKey(5), dtype=jnp.float32)
    L = cfg.num_layers

    state = {}
    for l in range(L):
        pl = jax.tree.map(lambda v: v[l], p["layers"])
        lp = f"layers.{l}"
        state[f"{lp}.self_attn.in_proj_weight"] = pl["attn"]["in_proj"].reshape(
            32, -1).T  # [W=1,d,3d] -> [3d, d]
        state[f"{lp}.self_attn.out_proj.weight"] = pl["attn"]["out_proj"][0].T
        state[f"{lp}.norm1.alpha"] = pl["norm1"]["scale"]
        state[f"{lp}.norm2.alpha"] = pl["norm2"]["scale"]
        state[f"{lp}.gating.linear_in.weight"] = pl["mlp"]["linear_in"][0].T
        state[f"{lp}.gating.linear_out.weight"] = pl["mlp"]["linear_out"][0].T
        ca = f"{lp}.cross_attention"
        state[f"{ca}.in_proj_weight_q"] = pl["cross_attn"]["q_proj"].T
        state[f"{ca}.in_proj_weight_kv"] = pl["cross_attn"]["kv_proj"].T
        state[f"{ca}.out_proj.weight"] = pl["cross_attn"]["out_proj"].T
        state[f"{ca}.gate.alpha.0.weight"] = pl["cross_attn_gate"]["in_proj"].T
        state[f"{ca}.gate.alpha.2.weight"] = pl["cross_attn_gate"]["out_proj"].T
        state[f"{ca}.gate.alpha.2.bias"] = pl["cross_attn_gate"]["bias"]
        state[f"{lp}.norm_cross.alpha"] = pl["norm_cross"]["scale"]

    loaded = transformer_layers_from_torch(state, "", cfg)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6),
        {k: v for k, v in p["layers"].items()}, loaded)


# ----------------------------------------------------------------- presets
def test_presets_instantiate():
    from moshi_tpu.models import loaders
    from moshi_tpu.models.lm import LMModel

    # (name, dim, layers, heads, context, n_q, dep_q, text_card, cross, gate)
    table = [
        ("v0_1", 4096, 32, 32, 3000, 16, 8, 32000, False, "normal"),
        ("v0_1_vision", 4096, 32, 32, 3000, 8, 8, 32000, True,
         "conditional_gated_sigmoid"),
        ("v0_1_vision_streaming", 4096, 32, 32, 3000, 16, 8, 32000, True,
         "conditional_gated_sigmoid"),
        ("tts_v0_1", 2048, 48, 32, 4096, 16, 16, 32000, True, "normal"),
        ("s2s_v0_1", 2048, 16, 16, 3000, 16, 16, 48000, False, "normal"),
        ("asr_v0_1_1b", 2048, 16, 16, 750, 8, 0, 48000, False, "normal"),
        ("asr_300m_202501", 1024, 16, 8, 750, 32, 0, 48000, False, "normal"),
        ("tts_202501", 2048, 48, 32, 500, 32, 32, 8000, True, "normal"),
        ("s2s_2b_16rvq_202501", 2560, 24, 20, 3000, 32, 16, 48000, False,
         "normal"),
    ]
    for (name, dim, layers, heads, ctx, n_q, dep_q, text_card, cross,
         gate) in table:
        cfg = loaders.LM_PRESETS[name]()
        assert cfg.dim == dim and cfg.num_layers == layers, name
        assert cfg.num_heads == heads and cfg.context == ctx, name
        assert cfg.n_q == n_q and cfg.dep_q == dep_q, name
        assert cfg.text_card == text_card, name
        assert cfg.cross_attention == cross, name
        assert cfg.cross_attention_gating == gate, name
        assert len(cfg.delays) == n_q + 1, name
        model = LMModel(cfg)
        assert (model.depformer is None) == (dep_q == 0), name
        if dep_q:
            # rust depformer: always d=1024/16h/6l, hidden 11*1024/4 = 2816
            dcfg = cfg.depformer_config
            assert dcfg.d_model == 1024 and dcfg.num_layers == 6, name
            assert dcfg.hidden == 2816, name
        # rust Mlp with silu gating: hidden = 11*d/4 (transformer.rs:548-556)
        if cfg.gating == "silu":
            assert cfg.transformer_config.hidden == 11 * dim // 4, name

    # vision preset shares cross-attn projections
    v = loaders.LM_PRESETS["v0_1_vision"]()
    assert v.shared_cross_attn and v.cross_attention_norm == "rms_norm_f32"
    t = loaders.LM_PRESETS["tts_v0_1"]()
    assert not t.shared_cross_attn and t.cross_attention_norm == "layer_norm"
    assert t.gating == "none" and t.hidden_scale == 4.0
    assert t.card == 2049 and t.text_card_out == 32001


def test_checkpoint_info_preset_selection(tmp_path):
    import json
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.models.lm import LmConfig

    (tmp_path / "config.json").write_text(json.dumps(
        {"preset": "asr_300m_202501", "model_type": "stt"}))
    info = CheckpointInfo.from_dir(tmp_path)
    assert isinstance(info.lm_config, LmConfig)
    assert info.lm_config.dim == 1024
    assert info.num_mimi_codebooks() == 32

    (tmp_path / "config.json").write_text(json.dumps({"preset": "nope"}))
    with pytest.raises(ValueError, match="unknown LM preset"):
        CheckpointInfo.from_dir(tmp_path)
