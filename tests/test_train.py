"""Training step: loss decreases on a memorizable batch, and the sharded
(dp, tp) mesh inference path produces the same outputs as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from test_lm import tiny_lm_config
from moshi_tpu.models.lm import LMModel
from moshi_tpu.train import make_train_step


def test_train_step_reduces_loss():
    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    optimizer = optax.adamw(3e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model, optimizer))

    codes = jax.random.randint(jax.random.PRNGKey(1),
                               (2, cfg.num_codebooks, 8), 0, 32)
    losses = []
    for _ in range(15):
        params, opt_state, loss, metrics = step(params, opt_state, codes)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]
    assert np.isfinite(losses).all()


def test_sharded_inference_matches_single_device():
    """Tensor-parallel sharded gen.step over the virtual mesh must produce the
    same greedy tokens as unsharded execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from moshi_tpu.parallel.mesh import make_mesh, lm_param_spec
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig

    cfg = tiny_lm_config(dim=64, num_heads=4)
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    gen = LMGen(model, LMGenConfig(use_sampling=False))
    B, T = 2, 6
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, n_in, T), 0, cfg.card)

    # single device reference
    st = gen.init_state(B, jax.random.PRNGKey(2), dtype=jnp.float32)
    ref_outs = []
    for t in range(T):
        o, st = gen.step(params, st, tokens[:, :, t:t + 1])
        ref_outs.append(np.asarray(o))

    mesh = make_mesh(8, tp=4)
    specs = lm_param_spec(params, mesh)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
    st = gen.init_state(B, jax.random.PRNGKey(2), dtype=jnp.float32)
    step = jax.jit(gen.step)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        for t in range(T):
            o, st = step(sharded, st, tokens[:, :, t:t + 1])
            np.testing.assert_array_equal(np.asarray(o), ref_outs[t],
                                          err_msg=f"step {t}")


def test_train_checkpoint_resume_bitwise():
    """save_train_state/load_train_state round-trip: 3 steps + save + resume
    + 2 steps produces bitwise-identical params to 5 uninterrupted steps."""
    import jax.numpy as jnp
    from moshi_tpu.train import (make_train_step, save_train_state,
                                 load_train_state)

    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    optimizer = optax.adamw(3e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model, optimizer))
    codes = jax.random.randint(jax.random.PRNGKey(1),
                               (2, cfg.num_codebooks, 8), 0, 32)

    p5, o5 = params, opt_state
    for _ in range(5):
        p5, o5, loss5, _ = step(p5, o5, codes)

    p, o = params, opt_state
    for _ in range(3):
        p, o, _, _ = step(p, o, codes)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "train.safetensors")
        save_train_state(path, p, o, 3, rng=jax.random.PRNGKey(7))
        p2, o2, got_step, rng = load_train_state(path, optimizer.init(params))
        assert got_step == 3 and rng is not None
    for _ in range(2):
        p2, o2, loss2, _ = step(p2, o2, codes)

    flat5, flat2 = jax.tree.leaves(p5), jax.tree.leaves(p2)
    assert len(flat5) == len(flat2)
    for a, b in zip(flat5, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(loss5), float(loss2), rtol=1e-6)


def test_train_state_roundtrip_lora_quantized_leaves():
    """Training-state files preserve structured leaves: a LoRAWeight over a
    quantized (QTensor) frozen base survives save/load with exact values."""
    import jax.numpy as jnp
    import tempfile, os
    from moshi_tpu.train import save_train_state, load_train_state
    from moshi_tpu.models.lora import LoRAWeight
    from moshi_tpu.utils.quantize import quantize_tensor, QTensor

    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(32, 16).astype(np.float32) * 0.1)
    params = {"lin": {"weight": LoRAWeight(
        quantize_tensor(w),
        jnp.asarray(rs.randn(32, 4).astype(np.float32)),
        jnp.asarray(rs.randn(4, 16).astype(np.float32)), 2.0)},
        "plain": jnp.asarray(rs.randn(8).astype(np.float32))}
    opt_state = optax.adam(1e-3).init(
        jax.tree.map(lambda x: x, {"plain": params["plain"]}))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "s.safetensors")
        save_train_state(path, params, opt_state, 11)
        p2, o2, step, rng = load_train_state(
            path, optax.adam(1e-3).init({"plain": params["plain"]}))
    assert step == 11 and rng is None
    lw = p2["lin"]["weight"]
    assert isinstance(lw, LoRAWeight) and isinstance(lw.base, QTensor)
    np.testing.assert_array_equal(np.asarray(lw.base.q),
                                  np.asarray(params["lin"]["weight"].base.q))
    np.testing.assert_array_equal(np.asarray(lw.a),
                                  np.asarray(params["lin"]["weight"].a))
    assert lw.scaling == 2.0
    np.testing.assert_allclose(
        np.asarray(lw.astype(jnp.float32)),
        np.asarray(params["lin"]["weight"].astype(jnp.float32)))


def test_remat_gradients_match():
    """remat=True recomputes layer activations in backward; loss and
    gradients must match the stored-activation path exactly."""
    from dataclasses import replace
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.train import make_loss_fn
    from test_lm import tiny_lm_config

    cfg = tiny_lm_config()
    model = LMModel(cfg)
    model_r = LMModel(replace(cfg, remat=True))
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    codes = jax.random.randint(jax.random.PRNGKey(1),
                               (2, cfg.num_codebooks, 6), 0, cfg.card)

    def grads(m):
        (loss, _), g = jax.value_and_grad(make_loss_fn(m), has_aux=True)(
            params, codes)
        return loss, g

    loss0, g0 = jax.jit(lambda: grads(model))()
    loss1, g1 = jax.jit(lambda: grads(model_r))()
    np.testing.assert_allclose(np.asarray(loss0), np.asarray(loss1),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)
