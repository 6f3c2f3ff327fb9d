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
