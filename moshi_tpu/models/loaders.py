"""Checkpoint loading: reference (PyTorch) safetensors -> moshi_tpu pytrees.

Mirrors the reference loader surface (`moshi/moshi/models/loaders.py`):
`CheckpointInfo` reads the same `config.json` schema (keys at 222-234);
canonical Mimi hyperparameters at 38-88; weight-name migrations — fused
`in_proj_weight` splitting (modules/transformer.py:422-446), old RVQ buffer
names (quantization/core_vq.py:162-176) and weight-norm folding
(`rust/moshi-core/src/conv.rs:27-45`) — are applied here at conversion time.

Conversion conventions (torch -> ours):
- Conv1d   [Cout, Cin/g, K]    -> [K, Cin/g, Cout]
- ConvTr1d [Cin, Cout/g, K]    -> [K, Cin/g, Cout]
- Linear   [out, in]           -> [in, out]
- per-step ModuleLists         -> stacked on a leading [W, ...] axis
- per-layer modules            -> stacked on a leading [L, ...] axis
- RVQ embedding                = embedding_sum / clamp(cluster_usage, 1e-5)
"""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .mimi import MimiConfig, MimiModel
from .lm import LmConfig, LMModel
from ..modules.seanet import SEANetConfig
from ..modules.transformer import TransformerConfig

SAMPLE_RATE = 24_000
FRAME_RATE = 12.5


# --------------------------------------------------------------------- utils
def load_safetensors(path: str | Path) -> dict:
    from safetensors import safe_open
    out = {}
    with safe_open(str(path), framework="flax") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_weights(path: str | Path) -> dict:
    """Name-keyed weight dict from safetensors OR gguf (the rust ecosystem's
    quantized checkpoint format, `rust/moshi-core/src/lm.rs:1009-1031`).
    gguf q8_0/f16/bf16 tensors are dequantized to f32; the serving path
    re-quantizes to MXU-native QTensors via quantize_lm_params."""
    path = Path(path)
    if path.suffix == ".gguf":
        from .gguf import read_gguf
        _, tensors = read_gguf(path)
        return {k: jnp.asarray(v) for k, v in tensors.items()}
    return load_safetensors(path)


def _fold_weight_norm(state: dict, key: str):
    """Fold weight_norm parametrisation if present (conv.rs:27-45)."""
    g, v = key + "_g", key + "_v"
    if g in state:
        wv = state[v]
        norm = jnp.sqrt(jnp.sum(jnp.square(wv.astype(jnp.float32)),
                                axis=tuple(range(1, wv.ndim)), keepdims=True))
        return (state[g].astype(jnp.float32) * wv.astype(jnp.float32) / norm).astype(wv.dtype)
    # torch >= 2.1 parametrizations naming
    g2 = key.rsplit(".", 1)
    pg = g2[0] + ".parametrizations." + g2[1] + ".original0"
    pv = g2[0] + ".parametrizations." + g2[1] + ".original1"
    if pg in state:
        wv = state[pv]
        norm = jnp.sqrt(jnp.sum(jnp.square(wv.astype(jnp.float32)),
                                axis=tuple(range(1, wv.ndim)), keepdims=True))
        return (state[pg].astype(jnp.float32) * wv.astype(jnp.float32) / norm).astype(wv.dtype)
    return state[key]


def _conv_w(state: dict, key: str) -> jnp.ndarray:
    return jnp.transpose(_fold_weight_norm(state, key), (2, 1, 0))


def _convtr_w(state: dict, key: str, groups: int) -> jnp.ndarray:
    w = _fold_weight_norm(state, key)  # [Cin, Cout/g, K]
    cin, cout_g, K = w.shape
    if groups == 1:
        return jnp.transpose(w, (2, 0, 1))
    w = w.reshape(groups, cin // groups, cout_g, K)
    w = jnp.transpose(w, (3, 1, 0, 2))  # [K, Cin/g, g, Cout/g]
    return w.reshape(K, cin // groups, groups * cout_g)


def _lin(state: dict, key: str) -> jnp.ndarray:
    return state[key].T


def _conv_params(state: dict, prefix: str) -> dict:
    p = {"weight": _conv_w(state, prefix + ".weight")}
    if prefix + ".bias" in state:
        p["bias"] = state[prefix + ".bias"]
    return p


def _convtr_params(state: dict, prefix: str, groups: int) -> dict:
    p = {"weight": _convtr_w(state, prefix + ".weight", groups)}
    if prefix + ".bias" in state:
        p["bias"] = state[prefix + ".bias"]
    return p


def _norm_params(state: dict, prefix: str, norm: str) -> dict:
    if norm.startswith("rms_norm"):
        return {"scale": state[prefix + ".alpha"].reshape(-1)}
    p = {"scale": state[prefix + ".weight"]}
    if prefix + ".bias" in state:
        p["bias"] = state[prefix + ".bias"]
    return p


def _stack(trees: list) -> dict:
    """Stack a list of identically-structured dicts on a new leading axis."""
    import jax
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


# -------------------------------------------------------------- transformer
def _attn_proj(state: dict, prefix: str, name: str, W: int) -> jnp.ndarray:
    """Per-step attention projection stack [W, in, out].  Handles both the
    split `in_projs.{i}.weight` layout and the legacy fused `in_proj_weight`
    (reference load hook, transformer.py:422-446)."""
    fused_names = {"in_projs": ["in_proj_weight", "in_proj.weight"],
                   "out_projs": ["out_proj.weight"]}
    for fn in fused_names[name]:
        k = f"{prefix}.{fn}"
        if k in state:
            w = state[k]  # [W*out, in]
            out = w.shape[0] // W
            return jnp.transpose(w.reshape(W, out, w.shape[1]), (0, 2, 1))
    ws = [state[f"{prefix}.{name}.{i}.weight"].T for i in range(W)]
    return jnp.stack(ws)


def _cross_attn_proj_params(state: dict, prefix: str,
                            cfg: TransformerConfig) -> dict:
    """Cross-attention projections in any of the three reference layouts:
    - PyTorch fused `in_projs.0.weight` / `in_proj.weight` [d+2d, d]
      (moshi/modules/transformer.py:382-420)
    - rust legacy fused `in_proj_weight` (transformer.rs:216-236)
    - rust separate `in_proj_weight_q` [d, d] + `in_proj_weight_kv`
      [2d, kv_in] (transformer.rs:238-261)
    -> {"q_proj": [d, d], "kv_proj": [kv_in, 2d], "out_proj": [d, d]}."""
    d = cfg.d_model
    for name in ("in_projs.0.weight", "in_proj.weight", "in_proj_weight"):
        k = f"{prefix}.{name}"
        if k in state:
            w = state[k]  # [3d, d]
            return {
                "q_proj": w[:d].T,
                "kv_proj": w[d:].T,
                "out_proj": _out_proj_w(state, prefix),
            }
    return {
        "q_proj": state[f"{prefix}.in_proj_weight_q"].T,
        "kv_proj": state[f"{prefix}.in_proj_weight_kv"].T,
        "out_proj": _out_proj_w(state, prefix),
    }


def _out_proj_w(state: dict, prefix: str) -> jnp.ndarray:
    for name in ("out_projs.0.weight", "out_proj.weight"):
        k = f"{prefix}.{name}"
        if k in state:
            return state[k].T
    raise KeyError(f"no cross-attention out_proj under {prefix}")


def _cross_attn_gate_params(state: dict, prefix: str,
                            cfg: TransformerConfig) -> dict | None:
    """XaGate params (rust transformer.rs:119-166): `gate.alpha` for the
    constant variants; `gate.alpha.0.weight` / `gate.alpha.2.weight[+bias]`
    for the conditional MLP variants."""
    g = cfg.cross_attention_gating
    if g == "normal":
        return None
    if g.startswith("constant_gated"):
        return {"alpha": state[f"{prefix}.gate.alpha"]}
    p = {"in_proj": _lin(state, f"{prefix}.gate.alpha.0.weight"),
         "out_proj": _lin(state, f"{prefix}.gate.alpha.2.weight")}
    if f"{prefix}.gate.alpha.2.bias" in state:
        p["bias"] = state[f"{prefix}.gate.alpha.2.bias"]
    return p


def transformer_layers_from_torch(state: dict, prefix: str,
                                  cfg: TransformerConfig) -> dict:
    """Convert `<prefix>.layers.{l}.*` into the stacked [L, ...] pytree."""
    layers = []
    for l in range(cfg.num_layers):
        lp = f"{prefix}.layers.{l}" if prefix else f"layers.{l}"
        W = cfg.num_weights
        p = {
            "attn": {
                "in_proj": _attn_proj(state, f"{lp}.self_attn", "in_projs", W),
                "out_proj": _attn_proj(state, f"{lp}.self_attn", "out_projs", W),
            },
            "norm1": _norm_params(state, f"{lp}.norm1", cfg.norm),
            "norm2": _norm_params(state, f"{lp}.norm2", cfg.norm),
        }
        if cfg.gating == "none":
            p["mlp"] = {
                "linear1": _lin(state, f"{lp}.linear1.weight"),
                "linear2": _lin(state, f"{lp}.linear2.weight"),
            }
        else:
            if W == 1 and f"{lp}.gating.linear_in.weight" in state:
                lin_in = _lin(state, f"{lp}.gating.linear_in.weight")[None]
                lin_out = _lin(state, f"{lp}.gating.linear_out.weight")[None]
            else:
                lin_in = jnp.stack([_lin(state, f"{lp}.gating.{s}.linear_in.weight")
                                    for s in range(W)])
                lin_out = jnp.stack([_lin(state, f"{lp}.gating.{s}.linear_out.weight")
                                     for s in range(W)])
            p["mlp"] = {"linear_in": lin_in, "linear_out": lin_out}
        if cfg.layer_scale is not None:
            p["layer_scale_1"] = {"scale": state[f"{lp}.layer_scale_1.scale"]}
            p["layer_scale_2"] = {"scale": state[f"{lp}.layer_scale_2.scale"]}
        if cfg.cross_attention:
            if not cfg.shared_cross_attn:
                p["cross_attn"] = _cross_attn_proj_params(
                    state, f"{lp}.cross_attention", cfg)
            gate = _cross_attn_gate_params(state, f"{lp}.cross_attention", cfg)
            if gate is not None:
                p["cross_attn_gate"] = gate
            p["norm_cross"] = _norm_params(state, f"{lp}.norm_cross",
                                           cfg.cross_attention_norm)
            if cfg.layer_scale is not None:
                p["layer_scale_cross"] = {"scale": state[f"{lp}.layer_scale_cross.scale"]}
        layers.append(p)
    return _stack(layers)


def _projected_transformer_from_torch(state: dict, prefix: str, model) -> dict:
    cfg = model.config
    p = {"layers": transformer_layers_from_torch(state, f"{prefix}.transformer", cfg)}
    if f"{prefix}.input_proj.weight" in state:
        p["input_proj"] = {"weight": _lin(state, f"{prefix}.input_proj.weight")}
    outs = []
    for i, od in enumerate(model.output_dimensions):
        k = f"{prefix}.output_projs.{i}.weight"
        outs.append({"weight": _lin(state, k)} if k in state else {})
    p["output_projs"] = outs
    return p


# --------------------------------------------------------------------- seanet
def _resblock_params(state: dict, prefix: str, block) -> dict:
    p = {"block": [_conv_params(state, f"{prefix}.block.{2 * j + 1}.conv.conv")
                   for j in range(len(block.convs))]}
    if block.shortcut is not None:
        p["shortcut"] = _conv_params(state, f"{prefix}.shortcut.conv.conv")
    return p


def seanet_from_torch(state: dict, prefix: str, net) -> dict:
    out = []
    for (kind, mod, _), ti in zip(net.items, net.torch_indices):
        base = f"{prefix}.model.{ti}"
        if kind == "conv":
            out.append(_conv_params(state, f"{base}.conv.conv"))
        elif kind == "convtr":
            out.append(_convtr_params(state, f"{base}.convtr.convtr", mod.groups))
        else:
            out.append(_resblock_params(state, base, mod))
    return {"model": out}


# ------------------------------------------------------------------------ RVQ
def _rvq_params(state: dict, prefix: str, n_q: int, eps: float = 1e-5) -> dict:
    embs = []
    for i in range(n_q):
        cb = f"{prefix}.vq.layers.{i}._codebook"
        # Support current and legacy buffer names (core_vq.py:162-176).
        for sum_name, usage_name in (("embedding_sum", "cluster_usage"),
                                     ("embed_sum", "cluster_usage"),
                                     ("embed_avg", "cluster_size")):
            if f"{cb}.{sum_name}" in state:
                s = state[f"{cb}.{sum_name}"].astype(jnp.float32)
                u = state[f"{cb}.{usage_name}"].astype(jnp.float32)
                embs.append(s / jnp.clip(u, eps, None)[:, None])
                break
        else:
            if f"{cb}.embedding" in state:
                embs.append(state[f"{cb}.embedding"].astype(jnp.float32))
            else:
                raise KeyError(f"no codebook buffers under {cb}")
    p = {"embedding": jnp.stack(embs)}
    if f"{prefix}.input_proj.weight" in state:
        p["input_proj"] = state[f"{prefix}.input_proj.weight"][:, :, 0].T
    if f"{prefix}.output_proj.weight" in state:
        p["output_proj"] = state[f"{prefix}.output_proj.weight"][:, :, 0].T
    return p


# ----------------------------------------------------------------------- Mimi
def mimi_params_from_torch_state(model: MimiModel, state: dict) -> dict:
    q = model.quantizer
    return {
        "encoder": seanet_from_torch(state, "encoder", model.encoder),
        "decoder": seanet_from_torch(state, "decoder", model.decoder),
        "encoder_transformer": _projected_transformer_from_torch(
            state, "encoder_transformer", model.encoder_transformer),
        "decoder_transformer": _projected_transformer_from_torch(
            state, "decoder_transformer", model.decoder_transformer),
        "downsample": _conv_params(state, "downsample.conv.conv.conv")
        if "downsample.conv.conv.conv.weight" in state
        else _conv_params(state, "downsample.conv.conv"),
        "upsample": _convtr_params(state, "upsample.convtr.convtr.convtr", model.upsample.convtr.groups)
        if "upsample.convtr.convtr.convtr.weight" in state
        else _convtr_params(state, "upsample.convtr.convtr", model.upsample.convtr.groups),
        "quantizer": {
            "rvq_first": _rvq_params(state, "quantizer.rvq_first", q.rvq_first.config.n_q),
            "rvq_rest": _rvq_params(state, "quantizer.rvq_rest", q.rvq_rest.config.n_q),
        },
    }


def mimi_config_from_dict(d: dict | None, num_codebooks: int = 8) -> MimiConfig:
    """Build a MimiConfig from the reference `mimi_config` dict schema
    (loaders.py:81-88), defaulting to the canonical v0.1 hyperparameters."""
    if d is None:
        return MimiConfig(num_codebooks=num_codebooks)
    sn = d.get("seanet", {})
    tr = d.get("transformer", {})
    qt = d.get("quantizer", {})
    seanet = SEANetConfig(
        channels=sn.get("channels", 1), dimension=sn.get("dimension", 512),
        n_filters=sn.get("n_filters", 64),
        n_residual_layers=sn.get("n_residual_layers", 1),
        ratios=tuple(sn.get("ratios", (8, 6, 5, 4))),
        kernel_size=sn.get("kernel_size", 7),
        residual_kernel_size=sn.get("residual_kernel_size", 3),
        last_kernel_size=sn.get("last_kernel_size", 3),
        dilation_base=sn.get("dilation_base", 2), compress=sn.get("compress", 2),
        pad_mode=sn.get("pad_mode", "constant"))
    transformer = TransformerConfig(
        d_model=tr.get("d_model", 512), num_heads=tr.get("num_heads", 8),
        num_layers=tr.get("num_layers", 8),
        dim_feedforward=tr.get("dim_feedforward", 2048), causal=tr.get("causal", True),
        context=tr.get("context", 250),
        positional_embedding=tr.get("positional_embedding", "rope"),
        max_period=tr.get("max_period", 10_000.0), gating=tr.get("gating", "none"),
        norm=tr.get("norm", "layer_norm"), layer_scale=tr.get("layer_scale", 0.01))
    quant = dict(dimension=qt.get("dimension", 256),
                 input_dimension=qt.get("input_dimension", seanet.dimension),
                 output_dimension=qt.get("output_dimension", seanet.dimension),
                 n_q=qt.get("n_q", 32), bins=qt.get("bins", 2048))
    from ..quantization.vq import RVQConfig
    return MimiConfig(
        sample_rate=d.get("sample_rate", 24_000), channels=d.get("channels", 1),
        frame_rate=d.get("frame_rate", 12.5), seanet=seanet,
        transformer=transformer, quantizer=RVQConfig(**quant),
        num_codebooks=num_codebooks)


def get_mimi(weights_path: str | Path, mimi_config: dict | None = None,
             num_codebooks: int = 8) -> tuple[MimiModel, dict]:
    model = MimiModel(mimi_config_from_dict(mimi_config, num_codebooks))
    state = load_weights(weights_path)
    params = mimi_params_from_torch_state(model, state)
    return model, params


# ------------------------------------------------------------------------- LM
def _emb_params(state: dict, prefix: str) -> dict:
    p = {"weight": state[f"{prefix}.weight"]}
    if f"{prefix}.low_rank.weight" in state:
        p["low_rank"] = _lin(state, f"{prefix}.low_rank.weight")
    if f"{prefix}.out1.weight" in state:  # demux_second_stream (lm_utils.py:95-116)
        p["out1"] = _lin(state, f"{prefix}.out1.weight")
        p["out2"] = _lin(state, f"{prefix}.out2.weight")
    return p


def rust_state_to_torch(state: dict, schedule=None) -> dict:
    """Remap the rust ecosystem's per-slice on-disk names to the fused
    PyTorch layout `lm_params_from_torch_state` consumes.

    Rust checkpoints (gguf or safetensors) store one full weight set per
    depformer slice under `depformer.{i}.` (lm.rs:510-532 `vb.pp(slice_idx)`;
    the layout `scripts/import_rust.py` produces).  The torch layout fuses
    attn projections across steps (`chunk(max_df_steps)`) and indexes gating
    per step.  With a weights-per-step `schedule`, the rust file duplicates
    shared weights into each slice — the first slice of each unique schedule
    value is taken.
    """
    import re
    out, per_slice, slices = {}, {}, set()
    for k, v in state.items():
        m = re.match(r"depformer\.(\d+)\.(.+)$", k)
        if not m:
            out[k] = v
            continue
        i, rest = int(m.group(1)), m.group(2)
        slices.add(i)
        per_slice[(i, rest)] = v
    if not slices:
        return out
    S = max(slices) + 1
    # unique weight-step -> representative slice index
    if schedule is not None:
        reps = []
        for step in range(max(schedule) + 1):
            reps.append(schedule.index(step))
    else:
        reps = list(range(S))
    # linear_in is shared per unique weight step (import_rust.py writes
    # depformer_in[tch_idx] into every slice); linear_out and emb are
    # genuinely per slice
    for w, r in enumerate(reps):
        out[f"depformer_in.{w}.weight"] = per_slice[(r, "linear_in.weight")]
    for i in range(S):
        out[f"linears.{i}.weight"] = per_slice[(i, "linear_out.weight")]
        emb = "depformer_text_emb" if i == 0 else f"depformer_emb.{i - 1}"
        for sub in ("weight", "low_rank.weight"):
            if (i, f"emb.{sub}") in per_slice:
                out[f"{emb}.{sub}"] = per_slice[(i, f"emb.{sub}")]
    layer_ids = sorted({int(m.group(1)) for (_, r) in per_slice
                        for m in [re.match(r"transformer\.layers\.(\d+)\.", r)]
                        if m})
    for l in layer_ids:
        base = f"transformer.layers.{l}."
        dst = f"depformer.layers.{l}."
        for proj in ("self_attn.in_proj_weight", "self_attn.out_proj.weight"):
            out[dst + proj] = jnp.concatenate(
                [per_slice[(r, base + proj)] for r in reps], axis=0)
        for w, r in enumerate(reps):
            for which in ("linear_in", "linear_out"):
                out[dst + f"gating.{w}.{which}.weight"] = \
                    per_slice[(r, base + f"gating.{which}.weight")]
        for nrm in ("norm1", "norm2"):
            for sub in ("alpha", "weight", "bias"):
                if (0, base + f"{nrm}.{sub}") in per_slice:
                    out[dst + f"{nrm}.{sub}"] = per_slice[(0, base + f"{nrm}.{sub}")]
    return out


def lm_params_from_torch_state(model: LMModel, state: dict,
                               dtype=jnp.bfloat16) -> dict:
    c = model.config
    if any(k.startswith("depformer.0.") for k in state):
        state = rust_state_to_torch(
            state, schedule=(list(c.depformer_weights_per_step_schedule)
                             if c.depformer_weights_per_step_schedule else None))
    state = {k: v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v
             for k, v in state.items()}
    p = {
        "text_emb": _emb_params(state, "text_emb"),
        # n_q == 0 is the text-only (helium) case: an empty stack keeps
        # embed_inputs' vmap-sum a no-op
        "emb": {"weight":
                jnp.stack([state[f"emb.{k}.weight"] for k in range(c.n_q)])
                if c.n_q else jnp.zeros((0, c.card + 1, c.dim), dtype)},
        "transformer": _lm_transformer_params(state, c),
        "out_norm": _norm_params(state, "out_norm", c.norm),
        "text_linear": {"weight": _lin(state, "text_linear.weight")},
    }
    p["out_norm"] = {k: v.astype(jnp.float32) for k, v in p["out_norm"].items()}
    if c.extra_heads_num_heads:
        p["extra_heads"] = {"weight": jnp.stack(
            [_lin(state, f"extra_heads.{i}.weight")
             for i in range(c.extra_heads_num_heads)])}
    if model.depformer is not None:
        p["depformer_in"] = {"weight": jnp.stack(
            [_lin(state, f"depformer_in.{i}.weight") for i in range(c.num_depformer_in)])}
        p["depformer_text_emb"] = _emb_params(state, "depformer_text_emb")
        demb = [_emb_params(state, f"depformer_emb.{k}") for k in range(c.dep_q - 1)]
        p["depformer_emb"] = _stack(demb)
        p["depformer"] = {"layers": transformer_layers_from_torch(
            state, "depformer", c.depformer_config)}
        p["linears"] = {"weight": jnp.stack(
            [_lin(state, f"linears.{k}.weight") for k in range(c.dep_q)])}
    return p


def _lm_transformer_params(state: dict, c: LmConfig) -> dict:
    tcfg = c.transformer_config
    p = {"layers": transformer_layers_from_torch(state, "transformer", tcfg)}
    if tcfg.cross_attention and tcfg.shared_cross_attn:
        # All layers share layer 0's projections (rust transformer.rs:800).
        p["cross_attn_shared"] = _cross_attn_proj_params(
            state, "transformer.layers.0.cross_attention", tcfg)
    return p


def get_moshi_lm(weights_path: str | Path, lm_config: dict | LmConfig | None = None,
                 dtype=jnp.bfloat16, lora_weights: str | Path | None = None,
                 lora_scaling: float = 2.0) -> tuple[LMModel, dict]:
    if lm_config is None:
        config = lm_config_v0_1()
    elif isinstance(lm_config, LmConfig):
        config = lm_config
    else:
        lm_config = dict(lm_config)
        if lora_weights is None and lm_config.get("lora"):
            raise ValueError("config requires LoRA weights (lora=true)")
        lora_scaling = lm_config.get("lora_scaling", lora_scaling)
        config = LmConfig.from_dict(lm_config)
    model = LMModel(config)
    state = load_weights(weights_path)
    if lora_weights is not None:
        from .lora import fuse_lora_state
        state = fuse_lora_state(state, load_safetensors(lora_weights), lora_scaling)
    params = lm_params_from_torch_state(model, state, dtype)
    return model, params


def _depformer_kwargs(num_slices: int) -> dict:
    """The shared Depformer architecture of every rust preset
    (rust/moshi-core/src/lm.rs:48-75 `depformer_cfg`): d=1024, 16 heads,
    6 layers, SiLU-gated hidden 11d/4 (== ff 4224 in the python schema),
    context = num_slices.  dep_q == num_slices."""
    return dict(
        dep_q=num_slices, depformer_dim=1024, depformer_num_heads=16,
        depformer_num_layers=6, depformer_dim_feedforward=int(4.125 * 1024),
        depformer_gating="silu", depformer_pos_emb="none",
        depformer_max_period=10_000.0, depformer_layer_scale=None,
        depformer_multi_linear=True, depformer_weights_per_step=True)


def _acoustic_delays(n_q: int, dep_q: int, delay: int) -> tuple[int, ...]:
    """Text 0; per stream: semantic codebook 0, acoustic codebooks `delay`
    (rust lm_generate_multistream.rs acoustic_delay semantics)."""
    if dep_q == 0:
        return (0,) * (1 + n_q)
    out = [0, 0] + [delay] * (dep_q - 1)
    rest = n_q - dep_q
    while rest > 0:
        k = min(rest, dep_q)
        out += [0] + [delay] * (k - 1)
        rest -= k
    return tuple(out)


def lm_config_v0_1() -> LmConfig:
    """The canonical Moshi-7B configuration (loaders.py:90-119)."""
    return LmConfig(
        dim=4096, text_card=32000, existing_text_padding_id=3, n_q=16, dep_q=8,
        card=2048, num_heads=32, num_layers=32, hidden_scale=4.125, causal=True,
        layer_scale=None, context=3000, max_period=10_000.0, gating="silu",
        norm="rms_norm_f32", positional_embedding="rope", depformer_dim=1024,
        depformer_dim_feedforward=int(4.125 * 1024), depformer_num_heads=16,
        depformer_num_layers=6, depformer_layer_scale=None,
        depformer_multi_linear=True, depformer_max_period=10_000.0,
        depformer_gating="silu", depformer_pos_emb="none",
        depformer_weights_per_step=True,
        delays=(0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1))


def lm_config_v0_1_vision(num_slices: int = 8, streaming: bool = False) -> LmConfig:
    """Moshi-7B + gated cross-attention for vision conditioning
    (rust lm.rs:117-167 `v0_1_vision(_streaming)`): ConditionalGatedSigmoid
    gates, RmsNorm cross-norm, projections shared across layers."""
    n_q = 16 if streaming else 8
    return LmConfig(
        dim=4096, num_heads=32, num_layers=32, hidden_scale=4.125,
        context=3000, max_period=10_000.0, gating="silu", norm="rms_norm_f32",
        positional_embedding="rope", causal=True, layer_scale=None,
        card=2048, text_card=32000, n_q=n_q,
        cross_attention=True,
        cross_attention_gating="conditional_gated_sigmoid",
        cross_attention_norm="rms_norm_f32", shared_cross_attn=True,
        delays=_acoustic_delays(n_q, num_slices, 1),
        **_depformer_kwargs(num_slices))


def lm_config_tts_v0_1() -> LmConfig:
    """DSM TTS 1.6B (rust lm.rs:190-227 `tts_v0_1`): ungated LayerNorm
    cross-attention for voice embeddings, plain GELU MLP."""
    return LmConfig(
        dim=2048, num_heads=32, num_layers=48, hidden_scale=4.0,
        context=4096, max_period=10_000.0, gating="none", norm="layer_norm",
        positional_embedding="rope", causal=True, layer_scale=None,
        card=2049, text_card=32000, text_card_out=32001, n_q=16,
        cross_attention=True, cross_attention_gating="normal",
        cross_attention_norm="layer_norm",
        delays=_acoustic_delays(16, 16, 2),
        **_depformer_kwargs(16))


def lm_config_s2s_v0_1(num_slices: int = 16) -> LmConfig:
    """Speech-to-speech 1B (rust lm.rs:229-278 `s2s_v0_1(_streaming)`)."""
    return LmConfig(
        dim=2048, num_heads=16, num_layers=16, hidden_scale=4.125,
        context=3000, max_period=10_000.0, gating="silu", norm="rms_norm_f32",
        positional_embedding="rope", causal=True, layer_scale=None,
        card=2048, text_card=48000, n_q=16,
        delays=_acoustic_delays(16, num_slices, 2),
        **_depformer_kwargs(num_slices))


def lm_config_asr_v0_1_1b() -> LmConfig:
    """Streaming ASR 1B, no depformer (rust lm.rs:281-316 `asr_v0_1_1b`)."""
    return LmConfig(
        dim=2048, num_heads=16, num_layers=16, hidden_scale=4.125,
        context=750, max_period=100_000.0, gating="silu", norm="rms_norm_f32",
        positional_embedding="rope", causal=True, layer_scale=None,
        card=2048, text_card=48000, n_q=8, dep_q=0,
        delays=(0,) * 9)


def lm_config_asr_300m_202501() -> LmConfig:
    """kyutai/stt-class 300M ASR (rust lm.rs:318-352 `asr_300m_202501`)."""
    return LmConfig(
        dim=1024, num_heads=8, num_layers=16, hidden_scale=4.125,
        context=750, max_period=100_000.0, gating="silu", norm="rms_norm_f32",
        positional_embedding="rope", causal=True, layer_scale=None,
        card=2048, text_card=48000, n_q=32, dep_q=0,
        delays=(0,) * 33)


def lm_config_tts_202501() -> LmConfig:
    """DSM TTS 2025-01, 32 RVQ (rust lm.rs:355-394 `tts_202501`): ungated
    LayerNorm cross-attention, SiLU gating, RmsNorm main stack."""
    return LmConfig(
        dim=2048, num_heads=32, num_layers=48, hidden_scale=4.125,
        context=500, max_period=10_000.0, gating="silu", norm="rms_norm_f32",
        positional_embedding="rope", causal=True, layer_scale=None,
        card=2048, text_card=8000, n_q=32,
        cross_attention=True, cross_attention_gating="normal",
        cross_attention_norm="layer_norm",
        delays=_acoustic_delays(32, 32, 2),
        **_depformer_kwargs(32))


def lm_config_s2s_2b_16rvq_202501() -> LmConfig:
    """Speech-to-speech 2.6B, 16 generated + 16 input RVQ
    (rust lm.rs:397-433 `s2s_2b_16rvq_202501`)."""
    return LmConfig(
        dim=2560, num_heads=20, num_layers=24, hidden_scale=4.125,
        context=3000, max_period=100_000.0, gating="silu", norm="rms_norm_f32",
        positional_embedding="rope", causal=True, layer_scale=None,
        card=2048, text_card=48000, n_q=32,
        delays=_acoustic_delays(32, 16, 2),
        **_depformer_kwargs(16))


# Named presets for checkpoints that ship without a config.json (the rust
# server's hardcoded Config constructors, lm.rs:81-433).  Select via the
# `preset` key in config.json / worker TOML or CheckpointInfo(preset=...).
LM_PRESETS = {
    "v0_1": lm_config_v0_1,
    "moshi_7b": lm_config_v0_1,
    "v0_1_vision": lm_config_v0_1_vision,
    "v0_1_vision_streaming": lambda: lm_config_v0_1_vision(streaming=True),
    "tts_v0_1": lm_config_tts_v0_1,
    "s2s_v0_1": lm_config_s2s_v0_1,
    "asr_v0_1_1b": lm_config_asr_v0_1_1b,
    "asr_300m_202501": lm_config_asr_300m_202501,
    "tts_202501": lm_config_tts_202501,
    "s2s_2b_16rvq_202501": lm_config_s2s_2b_16rvq_202501,
}


# --------------------------------------------------------------- HF hub
def hf_get(filename: str | Path, hf_repo: str | None = None,
           check_local_file_exists: bool = False,
           revision: str | None = None) -> Path:
    """Resolve a file that may live on the Hugging Face hub
    (reference loaders.py:122-142): `hf://repo/name/file` pulls from another
    repo, `file://` forces a local read, a bare name resolves inside
    `hf_repo` (hub download with local cache), otherwise a local path."""
    if isinstance(filename, Path):
        return filename
    if filename.startswith("hf://"):
        parts = filename.removeprefix("hf://").split("/")
        repo_name = parts[0] + "/" + parts[1]
        return Path(_hf_hub_download(repo_name, "/".join(parts[2:]),
                                     revision=revision))
    if filename.startswith("file://"):
        return Path(filename.removeprefix("file://"))
    if hf_repo is not None:
        if check_local_file_exists and Path(filename).exists():
            return Path(filename)
        if Path(hf_repo).is_dir():  # local directory standing in for a repo
            return Path(hf_repo) / filename
        return Path(_hf_hub_download(hf_repo, filename, revision=revision))
    return Path(filename)


def _hf_hub_download(repo: str, filename: str, revision: str | None = None) -> str:
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "huggingface_hub is required to resolve hub checkpoints; "
            "pass local paths instead") from e
    return hf_hub_download(repo, filename, revision=revision)


# --------------------------------------------------------------- CheckpointInfo
class CheckpointInfo:
    """Parses the reference repository `config.json` (loaders.py:145-280).

    Files are resolved either under a local `root` directory
    (`from_dir`) or through explicit per-file paths (`from_hf_repo`,
    which downloads into the standard huggingface cache layout)."""

    def __init__(self, config: dict | None, root: Path | None = None,
                 paths: dict | None = None):
        config = dict(config or {})
        self.raw_config = dict(config)
        self.moshi_name = config.pop("moshi_name", "model.safetensors")
        self.mimi_name = config.pop("mimi_name", "tokenizer-e351c8d8-checkpoint125.safetensors")
        self.mimi_config_name = config.pop("mimi_config_name", None)
        self.tokenizer_name = config.pop("tokenizer_name", "tokenizer_spm_32k_3.model")
        self.lora_name = config.pop("lora_name", None)
        self.model_type = config.pop("model_type", "moshi")
        self.lm_gen_config = config.pop("lm_gen_config", {})
        self.tts_config = config.pop("tts_config", {})
        self.stt_config = config.pop("stt_config", {})
        self.model_id = config.pop("model_id", {})
        # Exported-native checkpoints (scripts/export_quantized.py) store the
        # param trees in moshi_tpu's own flattened safetensors layout (possibly
        # with QTensor int8/int4 leaves) instead of torch-style key names.
        self.native_format = bool(config.pop("native_format", False))
        # Rust-served checkpoints ship without full config.json schemas; a
        # `preset` name selects one of the hardcoded configs (lm.rs:81-433).
        self.preset = config.pop("preset", None)
        if self.preset is not None:
            if self.preset not in LM_PRESETS:
                raise ValueError(f"unknown LM preset {self.preset!r}; "
                                 f"known: {sorted(LM_PRESETS)}")
            self.lm_config = LM_PRESETS[self.preset]()
        else:
            self.lm_config = config if config else None
        self.root = root
        self.paths = dict(paths or {})

    def _path(self, key: str, name: str | None) -> Path:
        if key in self.paths:
            return self.paths[key]
        assert self.root is not None and name is not None, (key, name)
        return self.root / name

    @property
    def tokenizer_path(self) -> Path:
        return self._path("tokenizer", self.tokenizer_name)

    @classmethod
    def from_dir(cls, path: str | Path) -> "CheckpointInfo":
        path = Path(path)
        cfg = None
        if (path / "config.json").exists():
            cfg = json.loads((path / "config.json").read_text())
        return cls(cfg, root=path)

    @classmethod
    def from_hf_repo(cls, hf_repo: str,
                     moshi_weights: Path | str | None = None,
                     mimi_weights: Path | str | None = None,
                     tokenizer: Path | str | None = None,
                     config_path: Path | str | None = None,
                     mimi_config_path: Path | str | None = None,
                     lora_weights: Path | str | None = None,
                     revision: str | None = None) -> "CheckpointInfo":
        """Download the checkpoint files from a hub repo (with per-file
        overrides, each a local path or `hf://` URI) — reference
        loaders.py:180-280.  Repos without a config.json are assumed to be
        Moshi-7B-era legacy repos."""
        import warnings
        cfg = None
        if config_path is None:
            try:
                config_path = hf_get("config.json", hf_repo, revision=revision)
            except Exception:
                warnings.warn(f"Repository {hf_repo} contains no config.json; "
                              "assuming a legacy Moshi 7B layout.")
        if config_path is not None:
            cfg = json.loads(Path(config_path).read_text())
        info = cls(cfg)

        def resolve(override, name):
            if override is not None:
                return hf_get(override, revision=revision)
            if name is None:
                return None
            return hf_get(name, hf_repo, revision=revision)

        info.paths = {
            "moshi": resolve(moshi_weights, info.moshi_name),
            "mimi": resolve(mimi_weights, info.mimi_name),
            "tokenizer": resolve(tokenizer, info.tokenizer_name),
        }
        mc = (hf_get(mimi_config_path, revision=revision)
              if mimi_config_path is not None
              else resolve(None, info.mimi_config_name))
        if mc is not None:
            info.paths["mimi_config"] = mc
        lora = (hf_get(lora_weights, revision=revision)
                if lora_weights is not None
                else resolve(None, info.lora_name))
        if lora is not None:
            info.paths["lora"] = lora
        return info

    def num_mimi_codebooks(self) -> int:
        if self.lm_config is None:
            return 8
        if isinstance(self.lm_config, LmConfig):
            dep_q, n_q = self.lm_config.dep_q, self.lm_config.n_q
        else:
            dep_q, n_q = self.lm_config["dep_q"], self.lm_config["n_q"]
        n = max(dep_q, n_q - dep_q)
        if self.tts_config.get("multistream"):
            n //= 2
        return n

    def get_mimi(self):
        mimi_cfg = None
        if "mimi_config" in self.paths:
            mimi_cfg = json.loads(Path(self.paths["mimi_config"]).read_text())
        elif self.mimi_config_name:
            mimi_cfg = json.loads((self.root / self.mimi_config_name).read_text())
        mimi_path = self._path("mimi", self.mimi_name)
        if self.native_format:
            from .native_ckpt import load_params
            model = MimiModel(mimi_config_from_dict(mimi_cfg, self.num_mimi_codebooks()))
            return model, load_params(mimi_path)
        return get_mimi(mimi_path, mimi_cfg, self.num_mimi_codebooks())

    def get_moshi(self, dtype=jnp.bfloat16):
        if self.native_format:
            from .native_ckpt import load_params
            if isinstance(self.lm_config, LmConfig):
                config = self.lm_config
            elif self.lm_config:
                config = LmConfig.from_dict(self.lm_config)
            else:
                config = lm_config_v0_1()
            model = LMModel(config)
            params = load_params(self._path("moshi", self.moshi_name))
        else:
            if "lora" in self.paths:
                lora = self.paths["lora"]
            else:
                lora = self.root / self.lora_name if self.lora_name else None
            model, params = get_moshi_lm(self._path("moshi", self.moshi_name),
                                         self.lm_config, dtype,
                                         lora_weights=lora)
        if self.model_type == "hibiki":
            # Hibiki sometimes samples EOS (2) too early; replace its embedding
            # with PAD's so early EOS acts as PAD (reference loaders.py:308-313).
            w = params["text_emb"]["weight"]
            params["text_emb"]["weight"] = w.at[2].set(w[3])
        return model, params

    def get_conditioners(self, output_dim: int):
        """Build the checkpoint's conditioners and load their weights.

        The reference attaches the ConditionProvider/ConditionFuser to the
        LM itself (loaders.py:380-384, 449-473); here they are a separate
        module so unconditioned serving paths never carry them.  Returns
        `(condition_provider, fuser, params)` — provider/params are None
        when the config has no `conditioners` block, fuser is None without
        a `fuser` block.  Weights live in the moshi safetensors under
        `condition_provider.conditioners.<name>.*` (torch layout)."""
        from ..conditioners import ConditionFuser, conditioners_from_config

        raw = self.raw_config or {}
        provider, cp_params = None, None
        if raw.get("conditioners"):
            from safetensors import safe_open

            provider = conditioners_from_config(output_dim, raw["conditioners"])
            cp_params = {}
            # lazy reads: only the handful of conditioner tensors are pulled
            # from the (possibly multi-GB) moshi safetensors
            with safe_open(str(self._path("moshi", self.moshi_name)),
                           framework="flax") as f:
                keys = set(f.keys())
                for name in provider.conditioners:
                    prefix = f"condition_provider.conditioners.{name}"
                    p = {}
                    if f"{prefix}.embed.weight" in keys:
                        p["embed"] = f.get_tensor(f"{prefix}.embed.weight")
                    if f"{prefix}.output_proj.weight" in keys:
                        p["output_proj"] = f.get_tensor(
                            f"{prefix}.output_proj.weight").T
                    if f"{prefix}.learnt_padding" in keys:
                        p["learnt_padding"] = f.get_tensor(
                            f"{prefix}.learnt_padding")
                    cp_params[name] = p
        fuser = None
        if raw.get("fuser"):
            fuser = ConditionFuser({k: v for k, v in raw["fuser"].items()
                                    if k in ("sum", "cross", "prepend")})
        return provider, fuser, cp_params
