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


# ------------------------------------------------------- config-driven trainer
def _tiny_lm_train_cfg(**over):
    cfg = tiny_lm_config()
    d = {
        "target": "lm",
        "lm_config": dict(
            dim=cfg.dim, num_heads=cfg.num_heads, num_layers=cfg.num_layers,
            hidden_scale=cfg.hidden_scale, n_q=cfg.n_q, dep_q=cfg.dep_q,
            card=cfg.card, text_card=cfg.text_card, norm=cfg.norm,
            context=cfg.context, max_period=cfg.max_period, gating=cfg.gating,
            positional_embedding=cfg.positional_embedding,
            depformer_dim=cfg.depformer_dim,
            depformer_num_heads=cfg.depformer_num_heads,
            depformer_num_layers=cfg.depformer_num_layers,
            depformer_dim_feedforward=cfg.depformer_dim_feedforward,
            depformer_gating=cfg.depformer_gating,
            depformer_pos_emb=cfg.depformer_pos_emb,
            depformer_multi_linear=cfg.depformer_multi_linear,
            depformer_weights_per_step=cfg.depformer_weights_per_step,
            delays=list(cfg.delays)),
        "optimizer": {"lr": 3e-3, "schedule": "cosine", "warmup_steps": 5,
                      "grad_clip": 1.0},
        "steps": 60, "batch_size": 2, "seq_len": 8, "log_every": 0,
    }
    d.update(over)
    return d


def _tiny_mimi_train_cfg(**over):
    d = {
        "target": "mimi",
        "mimi_config": {
            "sample_rate": 1200, "channels": 1, "frame_rate": 12.5,
            "seanet": dict(dimension=32, n_filters=4, n_residual_layers=1,
                           ratios=[4, 3, 2], kernel_size=7,
                           residual_kernel_size=3, last_kernel_size=3,
                           dilation_base=2, compress=2, pad_mode="constant"),
            "transformer": dict(d_model=32, num_heads=2, num_layers=2,
                                dim_feedforward=64, causal=True, context=25,
                                positional_embedding="rope", gating="none",
                                norm="layer_norm", layer_scale=0.01),
            "quantizer": dict(dimension=16, input_dimension=32,
                              output_dimension=32, n_q=8, bins=32),
        },
        "num_codebooks": 4,
        "optimizer": {"lr": 1e-3, "grad_clip": 1.0},
        "steps": 40, "batch_size": 2, "seq_len": 4, "log_every": 0,
    }
    d.update(over)
    return d


def test_config_trainer_overfits_tiny_lm():
    """The config-driven CLI path (cosine schedule + warmup + clipping +
    grad accumulation) overfits a tiny LM on a repeated batch to ~zero
    loss (VERDICT r3 item 8)."""
    import json
    from moshi_tpu.train import run_training

    losses = []

    def log(line):
        d = json.loads(line)
        if "loss" in d:
            losses.append(d["loss"])

    out = run_training(_tiny_lm_train_cfg(
        log_every=10, optimizer={"lr": 3e-3, "schedule": "cosine",
                                 "warmup_steps": 5, "grad_clip": 1.0,
                                 "accum_steps": 2}), log=log)
    assert np.isfinite(losses).all()
    assert out["loss"] < 0.35, losses
    assert out["loss"] < losses[0] * 0.1, losses


def test_config_trainer_overfits_tiny_mimi():
    """The same CLI covers the Mimi codec: reconstruction + EMA-RVQ loss
    drops steeply on a repeated batch, codebooks stay healthy (entropy),
    and the trained params round-trip into a working codec."""
    import json
    from moshi_tpu.train import run_training

    losses = []

    def log(line):
        d = json.loads(line)
        if "loss" in d:
            losses.append(d["loss"])

    cfg = _tiny_mimi_train_cfg(log_every=10)
    out = run_training(cfg, log=log)
    assert np.isfinite(losses).all()
    assert out["loss"] < losses[0] * 0.6, losses
    assert out["metrics"]["entropy"] > 0.5  # codebooks in use, not collapsed
    # trained params (EMA codebooks synced back) drive the inference codec
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.models.loaders import mimi_config_from_dict
    mimi = MimiModel(mimi_config_from_dict(cfg["mimi_config"], 4))
    pcm = jnp.asarray(np.random.RandomState(0).randn(
        1, 1, 4 * mimi.frame_size).astype(np.float32) * 0.3)
    codes = mimi.encode(out["params"], pcm)
    audio = mimi.decode(out["params"], codes)
    assert audio.shape[0] == 1 and np.isfinite(np.asarray(audio)).all()
    assert (np.asarray(codes) >= 0).all()
    assert (np.asarray(codes) < 32).all()


def test_config_trainer_sharded_matches_single_device():
    """dp=2-sharded training over the virtual mesh converges to the same
    params as single-device (GSPMD psum == single-device reduction)."""
    from moshi_tpu.train import run_training

    cfg = _tiny_lm_train_cfg(steps=8)
    single = run_training(cfg)
    sharded = run_training({**cfg, "mesh": {"dp": 2}})
    np.testing.assert_allclose(single["loss"], sharded["loss"],
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(single["params"]),
                    jax.tree.leaves(sharded["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_config_trainer_fsdp_matches_single_device():
    """mesh {dp: 2, fsdp: true}: params AND optimizer state are ZeRO-3
    sharded over dp (fsdp_param_spec), the step still converges to the
    single-device result, and the big leaves actually live sharded (the
    memory claim, not just a spec)."""
    from moshi_tpu.train import run_training

    cfg = _tiny_lm_train_cfg(steps=8)
    single = run_training(cfg)
    fsdp = run_training({**cfg, "mesh": {"dp": 2, "fsdp": True}})
    np.testing.assert_allclose(single["loss"], fsdp["loss"],
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(single["params"]),
                    jax.tree.leaves(fsdp["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # post-step params keep a real (non-replicated) sharding — GSPMD
    # propagated it through the jitted step, so per-device HBM stays 1/dp
    sharded_leaves = [
        x for x in jax.tree.leaves(fsdp["params"])
        if getattr(x, "ndim", 0) and not x.sharding.is_fully_replicated]
    assert sharded_leaves, "no param leaf ended up dp-sharded"
    mu_sharded = [
        x for x in jax.tree.leaves(fsdp["opt_state"])
        if getattr(x, "ndim", 0) and not x.sharding.is_fully_replicated]
    assert mu_sharded, "no optimizer-state leaf ended up dp-sharded"


def test_fsdp_spec_composes_with_tp():
    """fsdp_param_spec(base=lm_param_spec) puts dp on a dim tp left alone
    (never double-shards), and scalars stay replicated."""
    from jax.sharding import PartitionSpec as P
    from moshi_tpu.parallel.mesh import (fsdp_param_spec, lm_param_spec,
                                         make_mesh)

    model = LMModel(tiny_lm_config())
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh(8, tp=4)
    base = lm_param_spec(params, mesh)
    combined = fsdp_param_spec(params, mesh, base=base)
    n_dp = 0
    for leaf, spec in zip(jax.tree.leaves(params),
                          jax.tree.leaves(combined),
                          strict=True):
        spec = spec if isinstance(spec, P) else P(*spec)
        assert len(spec) <= leaf.ndim
        for i, ax in enumerate(spec):
            if ax is None:
                continue
            assert leaf.shape[i] % mesh.shape[ax] == 0, (leaf.shape, spec)
        axes = [ax for ax in spec if ax is not None]
        assert len(axes) == len(set(axes)), spec  # no double-shard
        n_dp += "dp" in axes
        if leaf.ndim == 0:
            assert not axes
    assert n_dp > 0


def test_config_trainer_cli_and_resume(tmp_path):
    """main(--config) runs end-to-end, writes checkpoints, and --resume
    continues from them (same final loss as an uninterrupted run)."""
    import json
    from moshi_tpu.train import main, run_training

    cfg = _tiny_lm_train_cfg(steps=6)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out_dir = tmp_path / "ckpt"

    full = run_training(cfg)

    main(["--config", str(cfg_path), "--steps", "3",
          "--out-dir", str(out_dir)])
    ckpts = sorted(out_dir.glob("train-*.safetensors"))
    assert ckpts, list(out_dir.iterdir())
    resumed = run_training({**cfg, "resume": str(ckpts[-1])})
    np.testing.assert_allclose(full["loss"], resumed["loss"],
                               rtol=1e-5, atol=1e-6)
