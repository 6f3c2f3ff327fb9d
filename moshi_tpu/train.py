"""Training for the LM (teacher-forced multi-stream CE) and the Mimi codec
(reconstruction + RVQ EMA).

The reference ships no trainer (inference repo; FSDP hints only —
`modules/transformer.py:357,632`, `loaders.py:426`), so this is a TPU-native
addition: one jitted step — forward (lm.py:322-377 semantics), per-codebook
cross entropy (`moshi/moshi/utils/utils.py:7-52`), optax update — shardable
over a (dp, tp) mesh via `parallel.mesh`.  The codec path composes the
offline Mimi forward with `quantization.train.rvq_train_forward` (EMA
codebooks, k-means init, expired-code replacement — core_vq.py semantics)
under an L1 + multi-scale-STFT reconstruction loss.

`main()` is the config-driven CLI: `python -m moshi_tpu.train --config c.json`
covers both targets, with grad accumulation, LR schedules, gradient clipping,
dp sharding over a device mesh, and bitwise checkpoint/resume.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models.lm import LMModel, cross_entropy


def make_loss_fn(model: LMModel):
    def loss_fn(params, codes):
        out = model.forward(params, codes)
        audio_ce = cross_entropy(
            jnp.nan_to_num(out["logits"]),
            jnp.clip(codes[:, model.config.audio_offset:
                           model.config.audio_offset + model.config.dep_q], 0, None),
            out["mask"])
        text_ce = cross_entropy(
            jnp.nan_to_num(out["text_logits"]),
            jnp.clip(codes[:, :1], 0, None),
            out["text_mask"])
        return audio_ce + text_ce, {"audio_ce": audio_ce, "text_ce": text_ce}
    return loss_fn


def lora_optimizer(base: optax.GradientTransformation,
                   params: dict) -> optax.GradientTransformation:
    """Wrap an optimizer so only LoRA adapter leaves (a/b) receive updates
    and optimizer state; every other leaf's update is zeroed (frozen)."""
    from .models.lora import lora_labels
    return optax.multi_transform(
        {"adapter": base, "frozen": optax.set_to_zero()},
        lora_labels(params))


def make_train_step(model: LMModel, optimizer: optax.GradientTransformation):
    loss_fn = make_loss_fn(model)

    def train_step(params, opt_state, codes):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, codes)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    return train_step


# -------------------------------------------------------- optimizer factory
def make_optimizer(ocfg: dict, total_steps: int | None = None
                   ) -> optax.GradientTransformation:
    """Build the optimizer chain from a config dict:
    clip_by_global_norm -> adamw(schedule) [-> MultiSteps accumulation].

    Keys (all optional): lr (3e-4), schedule ("constant" | "cosine" |
    "linear"), warmup_steps (0), end_lr_ratio (0.1 — floor of the decay as a
    fraction of lr), b1 (0.9), b2 (0.95), eps (1e-8), weight_decay (0.0),
    grad_clip (0.0 = off), accum_steps (1).  `total_steps` bounds the decay
    horizon for cosine/linear."""
    lr = float(ocfg.get("lr", 3e-4))
    warmup = int(ocfg.get("warmup_steps", 0))
    kind = ocfg.get("schedule", "constant")
    end_lr = lr * float(ocfg.get("end_lr_ratio", 0.1))
    horizon = max(int(total_steps or 0), warmup + 1)
    if kind == "constant":
        schedule = (optax.linear_schedule(0.0, lr, warmup) if warmup
                    else lr)
    elif kind == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, horizon, end_value=end_lr)
    elif kind == "linear":
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.linear_schedule(lr, end_lr, horizon - warmup)], [warmup])
    else:
        raise ValueError(f"unknown schedule {kind!r}")
    opt = optax.adamw(schedule, b1=float(ocfg.get("b1", 0.9)),
                      b2=float(ocfg.get("b2", 0.95)),
                      eps=float(ocfg.get("eps", 1e-8)),
                      weight_decay=float(ocfg.get("weight_decay", 0.0)))
    clip = float(ocfg.get("grad_clip", 0.0))
    if clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    accum = int(ocfg.get("accum_steps", 1))
    if accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum)
    return opt


# ------------------------------------------------------------ codec training
def _stft_mag(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """x [B, T] -> magnitude spectrogram [B, frames, n_fft//2+1] (static
    shapes: framing by gather, Hann window, rfft)."""
    nf = 1 + (x.shape[-1] - n_fft) // hop
    idx = np.arange(nf)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[:, idx] * jnp.hanning(n_fft)
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def spectral_loss(a: jax.Array, b: jax.Array,
                  scales=(64, 128, 256, 512, 1024)) -> jax.Array:
    """Multi-resolution STFT loss (magnitude L1 + log-magnitude L1), the
    standard codec reconstruction criterion; scales longer than the signal
    are skipped."""
    total, n = 0.0, 0
    for n_fft in scales:
        if a.shape[-1] < n_fft:
            continue
        ma = _stft_mag(a, n_fft, n_fft // 4)
        mb = _stft_mag(b, n_fft, n_fft // 4)
        total = total + jnp.mean(jnp.abs(ma - mb)) + jnp.mean(
            jnp.abs(jnp.log(ma + 1e-5) - jnp.log(mb + 1e-5)))
        n += 1
    return total / max(n, 1)


def init_mimi_vq_state(mimi) -> dict:
    """EMA codebook state for the split quantizer (semantic + acoustic)."""
    from .quantization.train import init_train_state
    q = mimi.quantizer
    return {"first": init_train_state(q.rvq_first.config),
            "rest": init_train_state(q.rvq_rest.config)}


def make_mimi_loss_fn(mimi, tcfg=None, loss_weights: dict | None = None):
    """Differentiable offline Mimi forward with EMA-RVQ in the middle.

    Returns loss_fn(params, vq_state, pcm [B, 1, T], rng) ->
    (loss, (metrics, new_vq_state)).  Gradients flow through the encoder
    (via the commit loss and the straight-through estimator) and the
    decoder; codebooks update by EMA in `vq_state` (core_vq.py:317-335)."""
    from .quantization.train import RVQTrainConfig, rvq_train_forward
    tcfg = tcfg or RVQTrainConfig()
    w = {"l1": 1.0, "mstft": 1.0, "commit": 0.25, **(loss_weights or {})}
    q = mimi.quantizer

    def loss_fn(params, vq_state, pcm, rng):
        fs = mimi.frame_size
        T = pcm.shape[-1] - pcm.shape[-1] % fs
        pcm = pcm[..., :T]
        emb = mimi.encoder.apply(params["encoder"], pcm.transpose(0, 2, 1))
        (emb,) = mimi.encoder_transformer.apply(
            params["encoder_transformer"], emb)
        emb = mimi.downsample.apply(params["downsample"], emb)
        k1, k2 = jax.random.split(rng)
        r1, st1 = rvq_train_forward(q.rvq_first.config, tcfg,
                                    params["quantizer"]["rvq_first"],
                                    vq_state["first"], emb, k1)
        r2, st2 = rvq_train_forward(q.rvq_rest.config, tcfg,
                                    params["quantizer"]["rvq_rest"],
                                    vq_state["rest"], emb, k2)
        quantized = r1["quantized"] + r2["quantized"]
        out = mimi.upsample.apply(params["upsample"], quantized)
        (out,) = mimi.decoder_transformer.apply(
            params["decoder_transformer"], out)
        recon = mimi.decoder.apply(params["decoder"], out).transpose(0, 2, 1)
        Tm = min(recon.shape[-1], pcm.shape[-1])
        a, b = recon[:, 0, :Tm], pcm[:, 0, :Tm]
        l1 = jnp.mean(jnp.abs(a - b))
        mstft = spectral_loss(a, b)
        commit = r1["commit_loss"] + r2["commit_loss"]
        loss = w["l1"] * l1 + w["mstft"] * mstft + w["commit"] * commit
        metrics = {"l1": l1, "mstft": mstft, "commit": commit,
                   "entropy": 0.5 * (r1["entropy"] + r2["entropy"]),
                   "expired_frac": 0.5 * (r1["expired_frac"]
                                          + r2["expired_frac"])}
        return loss, (metrics, {"first": st1, "rest": st2})

    return loss_fn


def mimi_ema_label_tree(params: dict):
    """Label tree for multi_transform: quantizer codebook embeddings are
    EMA-managed ("ema", frozen for the gradient optimizer); everything else
    trains ("train")."""
    def label(path, _):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return ("ema" if "quantizer" in keys and "embedding" in keys
                else "train")
    return jax.tree_util.tree_map_with_path(label, params)


def make_mimi_train_step(mimi, optimizer, tcfg=None,
                         loss_weights: dict | None = None):
    loss_fn = make_mimi_loss_fn(mimi, tcfg, loss_weights)

    def train_step(params, vq_state, opt_state, pcm, rng):
        (loss, (metrics, new_vq)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, vq_state, pcm, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_vq, opt_state, loss, metrics

    return train_step


def sync_codebooks_from_vq_state(params: dict, vq_state: dict,
                                 epsilon: float = 1e-5) -> dict:
    """Write the EMA codebooks back into the inference params (the reference
    precomputes embedding = embedding_sum / usage at load, _rvq_params)."""
    from .quantization.train import embedding_from_state
    import copy
    params = dict(params)
    params["quantizer"] = copy.deepcopy(params["quantizer"])
    params["quantizer"]["rvq_first"]["embedding"] = embedding_from_state(
        vq_state["first"], epsilon)
    params["quantizer"]["rvq_rest"]["embedding"] = embedding_from_state(
        vq_state["rest"], epsilon)
    return params


# ----------------------------------------------------------- checkpoint/resume
def save_train_state(path, params, opt_state, step: int,
                     rng: jax.Array | None = None):
    """Save a full training state (params incl. QTensor/LoRAWeight leaves,
    optimizer state, step counter, rng) to one safetensors file.

    The reference checkpoints weights only (SURVEY §5: no optimizer state);
    resumable training is a TPU-native addition.  The optimizer state is
    stored as its flattened leaves; `load_train_state` rebuilds it against a
    freshly-initialized state of the SAME optimizer, so the optimizer
    configuration is part of the contract, not the file."""
    from .models import native_ckpt
    leaves = jax.tree.leaves(opt_state)
    tree = {
        "params": params,
        "opt_leaves": {str(i): x for i, x in enumerate(leaves)},
        "meta": {"step": jnp.asarray(step, jnp.int32)},
    }
    if rng is not None:
        tree["meta"]["rng"] = rng
    native_ckpt.save_params(path, tree)


def load_train_state(path, template_opt_state):
    """Returns (params, opt_state, step, rng|None).  `template_opt_state` is
    `optimizer.init(params)` for the same optimizer/param structure — its
    treedef rebuilds the saved leaves."""
    from .models import native_ckpt
    tree = native_ckpt.load_params(path)
    treedef = jax.tree.structure(template_opt_state)
    n = treedef.num_leaves
    leaves = [tree["opt_leaves"][str(i)] for i in range(n)]
    opt_state = jax.tree.unflatten(treedef, leaves)
    step = int(tree["meta"]["step"])
    rng = tree["meta"].get("rng")
    return tree["params"], opt_state, step, rng


# ------------------------------------------------------------ config-driven CLI
def _build_lm(cfg: dict):
    from .models.lm import LmConfig
    if cfg.get("checkpoint_dir"):
        from .models.loaders import CheckpointInfo
        info = CheckpointInfo.from_dir(cfg["checkpoint_dir"])
        return info.get_moshi(dtype=jnp.float32)
    model = LMModel(LmConfig.from_dict(dict(cfg["lm_config"])))
    params = model.init_params(jax.random.PRNGKey(int(cfg.get("seed", 0))),
                               dtype=jnp.float32)
    return model, params


def _build_mimi(cfg: dict):
    from .models.mimi import MimiModel
    from .models.loaders import mimi_config_from_dict
    if cfg.get("checkpoint_dir"):
        from .models.loaders import CheckpointInfo
        info = CheckpointInfo.from_dir(cfg["checkpoint_dir"])
        return info.get_mimi()
    mc = mimi_config_from_dict(dict(cfg["mimi_config"]),
                               cfg.get("num_codebooks", 8))
    model = MimiModel(mc)
    params = model.init_params(jax.random.PRNGKey(int(cfg.get("seed", 0))))
    return model, params


def _check_lm_codes(model, batch: np.ndarray):
    """Host-side token-validity check on the trainer data path.

    The model's embed() clamps out-of-range ids (mode="clip") so garbage
    client tokens can't poison a serving stream — but silently training on
    aliased tokens would mask upstream data/tokenizer bugs, where the
    reference errors loudly (`LMGen check=True`, moshi/models/lm.py:704-711).
    Allowed: row 0 (text) in [0, text_card], audio rows in [0, card],
    plus the zero-token -1 (masked positions)."""
    c = model.config
    text, audio = batch[:, :1], batch[:, 1:]
    bad_text = (text != -1) & ((text < 0) | (text > c.text_card))
    bad_audio = (audio != -1) & ((audio < 0) | (audio > c.card))
    if bad_text.any() or bad_audio.any():
        ex = np.concatenate([text[bad_text].ravel(), audio[bad_audio].ravel()])
        raise ValueError(
            f"training batch contains out-of-range tokens (e.g. {ex[:5]}); "
            f"valid: text [0,{c.text_card}], audio [0,{c.card}], or -1")


def _data_batches(cfg: dict, target: str, model, steps: int):
    """Yield `steps` batches.  kinds: synthetic_repeat (one memorizable
    random batch, the overfit harness), synthetic (fresh random each step),
    safetensors {path, key} (cycled along axis 0)."""
    d = dict(cfg.get("data", {"kind": "synthetic_repeat"}))
    kind = d.get("kind", "synthetic_repeat")
    B = int(cfg.get("batch_size", 2))
    T = int(cfg.get("seq_len", 8))
    rs = np.random.RandomState(int(d.get("seed", 0)))
    if kind in ("synthetic_repeat", "synthetic"):
        def make():
            if target == "lm":
                return rs.randint(
                    0, min(model.config.card, model.config.text_card),
                    size=(B, model.config.num_codebooks, T)).astype(np.int32)
            return (rs.randn(B, 1, T * model.frame_size) * 0.3).astype(
                np.float32)
        fixed = make() if kind == "synthetic_repeat" else None
        for _ in range(steps):
            yield fixed if fixed is not None else make()
    elif kind == "safetensors":
        from safetensors.numpy import load_file
        arr = load_file(d["path"])[d.get(
            "key", "codes" if target == "lm" else "pcm")]
        n = arr.shape[0]
        i = 0
        for _ in range(steps):
            idx = [(i + j) % n for j in range(B)]
            i = (i + B) % n
            yield np.ascontiguousarray(arr[idx])
    else:
        raise ValueError(f"unknown data kind {kind!r}")


def run_training(cfg: dict, log=print) -> dict:
    """Execute a training config; returns {step, loss, metrics, params,
    ...}.  Separated from main() so tests can drive it in-process."""
    import json
    import time
    from pathlib import Path

    target = cfg.get("target", "lm")
    steps = int(cfg.get("steps", 100))
    ocfg = dict(cfg.get("optimizer", {}))
    accum = int(ocfg.get("accum_steps", 1))
    seed = int(cfg.get("seed", 0))
    log_every = int(cfg.get("log_every", 20))
    save_every = int(cfg.get("save_every", 0))
    out_dir = cfg.get("out_dir")
    mesh = None
    mesh_cfg = dict(cfg.get("mesh", {}))
    dp = int(mesh_cfg.get("dp", 0))
    fsdp = bool(mesh_cfg.get("fsdp", False))
    if fsdp and dp < 2:
        # a config that *claims* ZeRO-3 but would silently run fully
        # replicated is a deployment footgun, not a preference
        raise ValueError(f"mesh.fsdp requires mesh.dp >= 2 (got dp={dp}); "
                         "FSDP shards params/optimizer state over the dp axis")
    if dp:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.mesh import make_mesh
        mesh = make_mesh(dp, tp=1)
        repl = NamedSharding(mesh, P())
        batch_shard = NamedSharding(mesh, P("dp"))

    if target == "lm":
        model, params = _build_lm(cfg)
        optimizer = make_optimizer(ocfg, steps * accum)
        if cfg.get("lora_only"):
            optimizer = lora_optimizer(optimizer, params)
        opt_state = optimizer.init(params)
        step_fn = jax.jit(make_train_step(model, optimizer))
        vq_state = None
    elif target == "mimi":
        from .quantization.train import RVQTrainConfig
        model, params = _build_mimi(cfg)
        tcfg = RVQTrainConfig(**cfg.get("rvq", {}))
        base = make_optimizer(ocfg, steps * accum)
        optimizer = optax.multi_transform(
            {"train": base, "ema": optax.set_to_zero()},
            mimi_ema_label_tree(params))
        opt_state = optimizer.init(params)
        step_fn = jax.jit(make_mimi_train_step(
            model, optimizer, tcfg, cfg.get("loss_weights")))
        vq_state = init_mimi_vq_state(model)
    else:
        raise ValueError(f"unknown target {target!r}")

    start = 0
    rng = jax.random.PRNGKey(seed)
    if cfg.get("resume"):
        params, opt_state, start, saved_rng = load_train_state(
            cfg["resume"], opt_state)
        if saved_rng is not None:
            rng = saved_rng
        if target == "mimi":
            from .models import native_ckpt
            vq_state = native_ckpt.load_params(
                str(cfg["resume"]) + ".vq")
        log(json.dumps({"event": "resumed", "step": start}))

    if mesh is not None:
        if fsdp:
            # ZeRO-3: params AND optimizer state fully sharded over dp
            # (shape-based rule — see parallel.mesh.fsdp_param_spec);
            # GSPMD all-gathers weights per layer and reduce-scatters
            # grads.  Cuts per-device state to 1/dp, the enabler for
            # training models whose adamw state exceeds one HBM.
            from .parallel.mesh import (fsdp_param_spec, opt_state_spec,
                                        shard_tree)
            p_specs = fsdp_param_spec(params, mesh)
            params = shard_tree(params, mesh, p_specs)
            # adamw mu/nu take the params' exact specs (see opt_state_spec)
            opt_state = shard_tree(
                opt_state, mesh,
                opt_state_spec(opt_state, params, p_specs, mesh))
            if vq_state is not None:
                vq_state = shard_tree(vq_state, mesh,
                                      fsdp_param_spec(vq_state, mesh))
        else:
            put = lambda t: jax.tree.map(  # noqa: E731
                lambda x: jax.device_put(x, repl), t)
            params, opt_state = put(params), put(opt_state)
            if vq_state is not None:
                vq_state = put(vq_state)

    def save(step_no):
        if not out_dir:
            return
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        path = str(Path(out_dir) / f"train-{step_no:06d}.safetensors")
        save_train_state(path, params, opt_state, step_no, rng=rng)
        if vq_state is not None:
            from .models import native_ckpt
            native_ckpt.save_params(path + ".vq", vq_state)
        log(json.dumps({"event": "saved", "path": path, "step": step_no}))

    loss = metrics = None
    t0 = time.time()
    # micro-batches: with accum_steps > 1 each optimizer update consumes
    # `accum` batches through optax.MultiSteps
    batches = _data_batches(cfg, target, model, (steps - start) * accum)
    for step_no in range(start, steps):
        for _ in range(accum):
            batch = next(batches)
            if target == "lm":
                _check_lm_codes(model, np.asarray(batch))
            batch = jnp.asarray(batch)
            if mesh is not None:
                batch = jax.device_put(batch, batch_shard)
            if target == "lm":
                params, opt_state, loss, metrics = step_fn(
                    params, opt_state, batch)
            else:
                rng, krng = jax.random.split(rng)
                params, vq_state, opt_state, loss, metrics = step_fn(
                    params, vq_state, opt_state, batch, krng)
        if log_every and (step_no + 1) % log_every == 0:
            log(json.dumps(
                {"step": step_no + 1, "loss": float(loss),
                 **{k: float(v) for k, v in metrics.items()},
                 "sec_per_step": (time.time() - t0) / (step_no + 1 - start)}))
        if save_every and (step_no + 1) % save_every == 0:
            save(step_no + 1)

    if target == "mimi":
        params = sync_codebooks_from_vq_state(params, vq_state)
    if out_dir:
        save(steps)
    return {"step": steps, "loss": float(loss),
            "metrics": {k: float(v) for k, v in (metrics or {}).items()},
            "params": params, "opt_state": opt_state, "vq_state": vq_state}


def main(argv=None):
    import argparse
    import json

    parser = argparse.ArgumentParser(
        description="Config-driven trainer (LM cross-entropy or Mimi codec)")
    parser.add_argument("--config", required=True,
                        help="JSON training config (see run_training)")
    parser.add_argument("--steps", type=int, default=None,
                        help="override config steps")
    parser.add_argument("--out-dir", default=None,
                        help="override config out_dir")
    parser.add_argument("--resume", default=None,
                        help="override config resume path")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        cfg = json.load(f)
    if args.steps is not None:
        cfg["steps"] = args.steps
    if args.out_dir is not None:
        cfg["out_dir"] = args.out_dir
    if args.resume is not None:
        cfg["resume"] = args.resume
    out = run_training(cfg)
    print(json.dumps({"final_step": out["step"], "final_loss": out["loss"],
                      **out["metrics"]}))


if __name__ == "__main__":
    main()
