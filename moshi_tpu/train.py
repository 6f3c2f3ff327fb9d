"""Minimal training step for the LM (teacher-forced multi-stream CE).

The reference ships no LM trainer (inference repo; FSDP hints only —
`modules/transformer.py:357,632`, `loaders.py:426`), so this is a TPU-native
addition: one jitted step — forward (lm.py:322-377 semantics), per-codebook
cross entropy (`moshi/moshi/utils/utils.py:7-52`), optax update — shardable
over a (dp, tp) mesh via `parallel.mesh`.
"""

from functools import partial

import jax
import jax.numpy as jnp
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
