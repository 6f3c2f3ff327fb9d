"""Runtime (unfused) LoRA: adapters train, bases stay frozen, fuse-back
matches — reference moshi/moshi/modules/lora.py:5-122 semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from test_lm import tiny_lm_config
from moshi_tpu.models.lm import LMModel
from moshi_tpu.models.lora import (LoRAWeight, replace_all_linear_with_lora,
                                   fuse_lora_params)
from moshi_tpu.train import make_train_step, make_loss_fn, lora_optimizer


def _setup():
    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    rs = np.random.RandomState(0)
    codes = rs.randint(0, cfg.card, (2, cfg.num_codebooks, 8)).astype(np.int32)
    codes[:, 0] = rs.randint(0, cfg.text_card, (2, 8))
    return model, params, jnp.asarray(codes)


def test_fresh_adapters_are_identity():
    """Zero-initialised B means the adapted model == the base model."""
    model, params, codes = _setup()
    lp = replace_all_linear_with_lora(params, rank=2, key=jax.random.PRNGKey(1),
                                      dtype=jnp.float32)
    assert isinstance(lp["transformer"]["layers"]["attn"]["in_proj"], LoRAWeight)
    assert lp["transformer"]["layers"]["attn"]["in_proj"].a.shape[-1] == 2
    out_base = model.forward(params, codes)
    out_lora = model.forward(lp, codes)
    m = np.asarray(out_base["text_mask"])
    np.testing.assert_allclose(np.asarray(out_lora["text_logits"])[m],
                               np.asarray(out_base["text_logits"])[m],
                               rtol=1e-5, atol=1e-6)


def test_lora_training_updates_only_adapters():
    model, params, codes = _setup()
    lp = replace_all_linear_with_lora(params, rank=2, key=jax.random.PRNGKey(1),
                                      dtype=jnp.float32)
    opt = lora_optimizer(optax.adam(2e-3), lp)
    step = jax.jit(make_train_step(model, opt))
    opt_state = opt.init(lp)

    loss_fn = make_loss_fn(model)
    loss0, _ = loss_fn(lp, codes)
    trained = lp
    for _ in range(20):
        trained, opt_state, loss, _ = step(trained, opt_state, codes)
    assert float(loss) < float(loss0), (float(loss), float(loss0))

    # bases (and non-adapted leaves like embeddings) are bit-identical
    w0 = lp["transformer"]["layers"]["attn"]["in_proj"]
    w1 = trained["transformer"]["layers"]["attn"]["in_proj"]
    np.testing.assert_array_equal(np.asarray(w0.base), np.asarray(w1.base))
    np.testing.assert_array_equal(np.asarray(lp["emb"]["weight"]),
                                  np.asarray(trained["emb"]["weight"]))
    np.testing.assert_array_equal(np.asarray(lp["text_emb"]["weight"]),
                                  np.asarray(trained["text_emb"]["weight"]))
    # adapters moved (b leaves zero init -> nonzero after training)
    assert np.abs(np.asarray(w1.b)).max() > 0
    assert not np.array_equal(np.asarray(w0.a), np.asarray(w1.a))

    # fuse-back: dense model == unfused adapted model
    fused = fuse_lora_params(trained)
    assert not isinstance(fused["transformer"]["layers"]["attn"]["in_proj"],
                          LoRAWeight)
    out_f = model.forward(fused, codes)
    out_u = model.forward(trained, codes)
    m = np.asarray(out_u["text_mask"])
    np.testing.assert_allclose(np.asarray(out_f["text_logits"])[m],
                               np.asarray(out_u["text_logits"])[m],
                               rtol=2e-4, atol=2e-4)
    la = np.asarray(out_u["mask"])
    np.testing.assert_allclose(np.asarray(out_f["logits"])[la],
                               np.asarray(out_u["logits"])[la],
                               rtol=2e-4, atol=2e-4)


def test_lora_generation_and_quantized_base():
    """LoRA over an int8-quantized base serves through LMGen (hot adapter
    swap scenario: quantized base weights + bf16 adapters)."""
    from moshi_tpu.utils.quantize import quantize_lm_params, QTensor
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig

    model, params, _ = _setup()
    qparams = quantize_lm_params(params, min_size=1)
    lp = replace_all_linear_with_lora(qparams, rank=2,
                                      key=jax.random.PRNGKey(1),
                                      dtype=jnp.float32)
    leaf = lp["transformer"]["layers"]["attn"]["in_proj"]
    assert isinstance(leaf, LoRAWeight) and isinstance(leaf.base, QTensor)

    gen = LMGen(model, LMGenConfig(use_sampling=False))
    st = gen.init_state(1, jax.random.PRNGKey(0), dtype=jnp.float32)
    n_in = model.config.num_codebooks - model.config.dep_q - 1
    toks = jnp.zeros((1, n_in, 1), jnp.int32)
    for _ in range(model.config.max_delay + 2):
        out, st = gen.step(lp, st, toks)
    assert (np.asarray(out) >= 0).all()
