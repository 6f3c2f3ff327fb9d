"""Golden-tensor conformance: run the reference repository's own committed
test assets (moshi/tests/assets/*.safetensors — tiny LM with delays
[0,1,2,4], weights-per-step schedule [0,1,1], low-rank embeddings) through
the moshi_tpu implementation and require the same per-codebook CE as the
committed reference outputs (reference test: moshi/tests/test_lm.py)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

ASSETS = Path("/root/reference/moshi/tests/assets")


@pytest.mark.skipif(not ASSETS.exists(), reason="reference assets unavailable")
def test_reference_golden_lm_forward():
    from moshi_tpu.models.lm import LmConfig, LMModel, cross_entropy as my_ce
    from moshi_tpu.models.loaders import lm_params_from_torch_state, load_safetensors

    cfg = LmConfig(
        delays=(0, 1, 2, 4), n_q=3, dep_q=3, card=32, text_card=48, dim=16,
        num_layers=2, num_heads=1, hidden_scale=1,
        depformer_dim=16, depformer_multi_linear=True,
        depformer_weights_per_step=True,
        depformer_weights_per_step_schedule=(0, 1, 1),
        depformer_low_rank_embeddings=8, depformer_num_heads=1,
        depformer_num_layers=2,  # reference LMModel default num_layers applies
        depformer_gating="silu", gating="silu", norm="layer_norm",
        context=4, positional_embedding="sin")
    # The reference test builds LMModel with defaults for unspecified args:
    # norm='layer_norm'? LMModel default norm is "layer_norm"; gating default
    # is "none"... build exactly via the reference to avoid guessing:
    torch = pytest.importorskip("torch")
    from refutil import import_reference
    import_reference()
    from moshi.models import lm as ref_lm

    torch.manual_seed(1234)
    ref = ref_lm.LMModel(
        delays=[0, 1, 2, 4], n_q=3, dep_q=3, card=32, text_card=48, dim=16,
        num_layers=2, num_heads=1, hidden_scale=1, depformer_dim=16,
        depformer_multi_linear=True, depformer_weights_per_step=True,
        depformer_weights_per_step_schedule=[0, 1, 1],
        depformer_low_rank_embeddings=8, depformer_num_heads=1,
        depformer_gating="silu", context=4, dtype=torch.float32)
    # introspect the reference defaults so our config matches exactly
    ref_tr = ref.transformer
    cfg = LmConfig(
        delays=(0, 1, 2, 4), n_q=3, dep_q=3, card=32, text_card=48, dim=16,
        num_layers=2, num_heads=1, hidden_scale=1,
        depformer_dim=16, depformer_multi_linear=True,
        depformer_weights_per_step=True,
        depformer_weights_per_step_schedule=(0, 1, 1),
        depformer_low_rank_embeddings=8, depformer_num_heads=1,
        depformer_num_layers=ref.depformer is not None and len(ref.depformer.layers),
        depformer_gating="silu",
        gating="none" if ref_tr.layers[0].gating is None else "silu",
        norm="layer_norm" if ref.out_norm.__class__.__name__ == "LayerNorm" else "rms_norm",
        context=4,
        positional_embedding=ref_tr.positional_embedding,
        depformer_pos_emb=ref.depformer.positional_embedding,
        depformer_dim_feedforward=16,  # hidden_scale 1 * depformer_dim
    )

    state = {k: jnp.asarray(v) for k, v in
             load_safetensors(ASSETS / "test_lm_model.safetensors").items()}
    model = LMModel(cfg)
    params = lm_params_from_torch_state(model, state, dtype=jnp.float32)

    codes = np.asarray(load_safetensors(ASSETS / "test_lm_codes.safetensors")["codes"])
    ref_out = load_safetensors(ASSETS / "test_lm_out.safetensors")

    out = model.forward(params, jnp.asarray(codes, jnp.int32))

    np.testing.assert_array_equal(np.asarray(out["mask"]),
                                  np.asarray(ref_out["mask"]))
    np.testing.assert_array_equal(np.asarray(out["text_mask"]),
                                  np.asarray(ref_out["text_mask"]))

    def percb_ce(logits, targets, mask):
        """Per-codebook mean CE like the reference utils.cross_entropy."""
        logits = np.asarray(logits, np.float32)
        lse = np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)), -1)) \
            + logits.max(-1)[..., ]
        ll = np.take_along_axis(logits, targets[..., None], -1)[..., 0] - lse
        ce = -ll * mask
        return ce.sum(axis=(0, 2)) / np.maximum(mask.sum(axis=(0, 2)), 1)

    mask = np.asarray(out["mask"])
    tgt = np.clip(codes[:, 1:], 0, None)
    ce_mine = percb_ce(np.nan_to_num(np.asarray(out["logits"])), tgt, mask)
    ce_ref = percb_ce(np.nan_to_num(np.asarray(ref_out["logits"])), tgt, mask)
    delta = np.abs(ce_mine - ce_ref) / ce_ref
    assert delta.max() <= 2e-5, delta

    tmask = np.asarray(out["text_mask"])
    ttgt = np.clip(codes[:, :1], 0, None)
    ce_mine = percb_ce(np.nan_to_num(np.asarray(out["text_logits"])), ttgt, tmask)
    ce_ref = percb_ce(np.nan_to_num(np.asarray(ref_out["text_logits"])), ttgt, tmask)
    delta = np.abs(ce_mine - ce_ref) / ce_ref
    assert delta.max() <= 2e-5, delta
