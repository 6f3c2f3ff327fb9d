"""LM tests: delay/undelay helpers, teacher-forced forward parity with the
reference, and greedy LMGen decode parity with the reference LMGen — the
gold-standard end-to-end behavioral test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import (LmConfig, LMModel, delay_sequence,
                                 undelay_logits, UNGENERATED_TOKEN)
from moshi_tpu.models.lm_gen import LMGen, LMGenConfig


def tiny_lm_config(**over) -> LmConfig:
    kw = dict(dim=32, num_heads=2, num_layers=2, hidden_scale=4.125, n_q=4,
              dep_q=2, card=48, text_card=64, norm="rms_norm_f32", context=10,
              max_period=10000.0, gating="silu", positional_embedding="rope",
              depformer_dim=16, depformer_num_heads=2, depformer_num_layers=2,
              depformer_dim_feedforward=64, depformer_gating="silu",
              depformer_pos_emb="none", depformer_multi_linear=True,
              depformer_weights_per_step=True,
              delays=(0, 0, 1, 0, 2))
    kw.update(over)
    return LmConfig(**kw)


def test_delay_undelay_roundtrip():
    delays = (0, 1, 3)
    B, K, T = 2, 3, 8
    toks = jax.random.randint(jax.random.PRNGKey(0), (B, K, T), 0, 10)
    initial = jnp.full((B, K), 99, jnp.int32)
    delayed = delay_sequence(delays, toks, initial)
    assert (delayed[:, 1, 0] == 99).all()
    assert (delayed[:, 2, :3] == 99).all()
    np.testing.assert_array_equal(np.asarray(delayed[:, 0]), np.asarray(toks[:, 0]))
    # undelay a [B, K, T, 1] "logits" built from the delayed tokens
    logits = delayed[..., None].astype(jnp.float32)
    undone, mask = undelay_logits(delays, logits)
    for k, d in enumerate(delays):
        valid = T - d
        np.testing.assert_array_equal(np.asarray(undone[:, k, :valid, 0]),
                                      np.asarray(delayed[:, k, d:].astype(jnp.float32)))
        assert bool(mask[:, k, :valid].all())
        assert not bool(mask[:, k, valid:].any())


def test_lm_forward_shapes():
    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    B, T = 2, 6
    codes = jax.random.randint(jax.random.PRNGKey(1), (B, cfg.num_codebooks, T), 0, 32)
    out = model.forward(params, codes)
    assert out["logits"].shape == (B, cfg.dep_q, T, cfg.card)
    assert out["text_logits"].shape == (B, 1, T, cfg.text_card)
    assert bool(jnp.isfinite(out["text_logits"]).all())


def _build_reference_lm(torch, cfg: LmConfig):
    from moshi.models.lm import LMModel as RefLM
    torch.manual_seed(0)
    ref = RefLM(
        delays=list(cfg.delays), n_q=cfg.n_q, dep_q=cfg.dep_q, card=cfg.card,
        text_card=cfg.text_card, dim=cfg.dim, num_heads=cfg.num_heads,
        hidden_scale=cfg.hidden_scale, norm=cfg.norm, context=cfg.context,
        causal=True, num_layers=cfg.num_layers, gating=cfg.gating,
        positional_embedding=cfg.positional_embedding, max_period=cfg.max_period,
        depformer_dim=cfg.depformer_dim,
        depformer_dim_feedforward=cfg.depformer_dim_feedforward,
        depformer_num_heads=cfg.depformer_num_heads,
        depformer_num_layers=cfg.depformer_num_layers,
        depformer_multi_linear=cfg.depformer_multi_linear,
        depformer_weights_per_step=cfg.depformer_weights_per_step,
        depformer_pos_emb=cfg.depformer_pos_emb,
        depformer_gating=cfg.depformer_gating,
        existing_text_padding_id=cfg.existing_text_padding_id,
        dtype=torch.float32,
    )
    ref.eval()
    return ref


def test_forward_parity_with_reference():
    torch = pytest.importorskip("torch")
    from refutil import import_reference, state_dict_to_numpy
    import_reference()

    cfg = tiny_lm_config()
    ref = _build_reference_lm(torch, cfg)

    from moshi_tpu.models.loaders import lm_params_from_torch_state
    state = {k: jnp.asarray(v) for k, v in state_dict_to_numpy(ref).items()}
    model = LMModel(cfg)
    params = lm_params_from_torch_state(model, state, dtype=jnp.float32)

    B, T = 2, 6
    rs = np.random.RandomState(0)
    codes = rs.randint(0, cfg.card, (B, cfg.num_codebooks, T)).astype(np.int64)
    codes[:, 0] = rs.randint(0, cfg.text_card, (B, T))

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(codes))
    out = model.forward(params, jnp.asarray(codes, jnp.int32))

    text_ref = out_ref.text_logits.numpy()
    text = np.asarray(out["text_logits"])
    mask = np.asarray(out["text_mask"])
    np.testing.assert_allclose(text[mask], text_ref[np.asarray(out_ref.text_mask)],
                               rtol=1e-3, atol=1e-3)

    log_ref = out_ref.logits.numpy()
    log = np.asarray(out["logits"])
    m = np.asarray(out["mask"])
    m_ref = np.asarray(out_ref.mask)
    np.testing.assert_array_equal(m, m_ref)
    np.testing.assert_allclose(log[m], log_ref[m_ref], rtol=1e-3, atol=1e-3)


def test_lmgen_greedy_parity_with_reference():
    """Greedy (use_sampling=False) frame-by-frame generation must produce the
    exact same token stream as the reference LMGen."""
    torch = pytest.importorskip("torch")
    from refutil import import_reference, state_dict_to_numpy
    import_reference()
    from moshi.models.lm import LMGen as RefLMGen

    cfg = tiny_lm_config()
    ref = _build_reference_lm(torch, cfg)
    ref_gen = RefLMGen(ref, use_sampling=False)

    from moshi_tpu.models.loaders import lm_params_from_torch_state
    state_np = {k: jnp.asarray(v) for k, v in state_dict_to_numpy(ref).items()}
    model = LMModel(cfg)
    params = lm_params_from_torch_state(model, state_np, dtype=jnp.float32)
    gen = LMGen(model, LMGenConfig(use_sampling=False))

    B, T = 2, 12
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    rs = np.random.RandomState(0)
    input_tokens = rs.randint(0, cfg.card, (B, n_in, T)).astype(np.int64)

    outs_ref = []
    with torch.no_grad(), ref_gen.streaming(B):
        for t in range(T):
            o = ref_gen.step(torch.from_numpy(input_tokens[:, :, t:t + 1]))
            outs_ref.append(None if o is None else o.numpy())

    gstate = gen.init_state(B, jax.random.PRNGKey(0), dtype=jnp.float32)
    step = jax.jit(gen.step)
    outs = []
    for t in range(T):
        o, gstate = step(params, gstate, jnp.asarray(input_tokens[:, :, t:t + 1], jnp.int32))
        outs.append(np.asarray(o))

    for t in range(T):
        if outs_ref[t] is None:
            assert (outs[t] == UNGENERATED_TOKEN).all(), f"step {t}"
        else:
            np.testing.assert_array_equal(outs[t], outs_ref[t], err_msg=f"step {t}")
