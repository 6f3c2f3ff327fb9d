"""Export a moshi_tpu LM param tree back to reference (PyTorch) safetensors
naming — the inverse of `models/loaders.lm_params_from_torch_state`.

Behavioral reference: `/root/reference/scripts/export_torch.py` (research ->
torch interchange).  Use case here: LoRA fine-tuned or re-trained weights on
TPU -> a checkpoint the reference PyTorch/MLX/rust stacks can load.

Conversion conventions (ours -> torch):
- Linear   [in, out]           -> [out, in]
- per-layer [L, ...] stacks    -> `transformer.layers.{l}.*`
- per-step  [W, ...] stacks    -> `...{i}.weight` module lists
- LoRAWeight / QTensor leaves  -> fused / dequantized dense weights

Usage: python scripts/export_torch.py CHECKPOINT_DIR OUT.safetensors
(loads via CheckpointInfo, exports the LM)
"""

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def _dense(w):
    """Fuse/dequantize structured leaves to a dense array."""
    if hasattr(w, "astype") and hasattr(w, "tree_flatten"):
        return w.astype(jnp.float32)
    return jnp.asarray(w)


def _lin(w) -> np.ndarray:
    # ascontiguousarray matters: safetensors save_file silently writes the
    # raw buffer of a non-contiguous view (strides ignored), corrupting
    # every transposed tensor on disk
    return np.ascontiguousarray(np.asarray(_dense(w), np.float32).T)


def _norm_out(state: dict, prefix: str, p: dict, norm: str):
    if norm.startswith("rms_norm"):
        state[f"{prefix}.alpha"] = np.asarray(p["scale"], np.float32).reshape(1, 1, -1)
    else:
        state[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
        if "bias" in p:
            state[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _emb_out(state: dict, prefix: str, p: dict):
    state[f"{prefix}.weight"] = np.asarray(_dense(p["weight"]), np.float32)
    if "low_rank" in p:
        state[f"{prefix}.low_rank.weight"] = _lin(p["low_rank"])
    if "out1" in p:
        state[f"{prefix}.out1.weight"] = _lin(p["out1"])
        state[f"{prefix}.out2.weight"] = _lin(p["out2"])


def transformer_layers_to_torch(state: dict, prefix: str, layers: dict, cfg):
    """Inverse of loaders.transformer_layers_from_torch."""
    import jax
    L = cfg.num_layers
    for l in range(L):
        pl = jax.tree.map(lambda v: v[l], layers)
        lp = f"{prefix}.layers.{l}" if prefix else f"layers.{l}"
        W = pl["attn"]["in_proj"].shape[0]
        for i in range(W):
            state[f"{lp}.self_attn.in_projs.{i}.weight"] = _lin(pl["attn"]["in_proj"][i])
            state[f"{lp}.self_attn.out_projs.{i}.weight"] = _lin(pl["attn"]["out_proj"][i])
        _norm_out(state, f"{lp}.norm1", pl["norm1"], cfg.norm)
        _norm_out(state, f"{lp}.norm2", pl["norm2"], cfg.norm)
        if "linear1" in pl.get("mlp", {}):
            state[f"{lp}.linear1.weight"] = _lin(pl["mlp"]["linear1"])
            state[f"{lp}.linear2.weight"] = _lin(pl["mlp"]["linear2"])
        else:
            Wg = pl["mlp"]["linear_in"].shape[0]
            if Wg == 1:
                state[f"{lp}.gating.linear_in.weight"] = _lin(pl["mlp"]["linear_in"][0])
                state[f"{lp}.gating.linear_out.weight"] = _lin(pl["mlp"]["linear_out"][0])
            else:
                for i in range(Wg):
                    state[f"{lp}.gating.{i}.linear_in.weight"] = _lin(pl["mlp"]["linear_in"][i])
                    state[f"{lp}.gating.{i}.linear_out.weight"] = _lin(pl["mlp"]["linear_out"][i])
        if "layer_scale_1" in pl:
            state[f"{lp}.layer_scale_1.scale"] = np.asarray(pl["layer_scale_1"]["scale"], np.float32)
            state[f"{lp}.layer_scale_2.scale"] = np.asarray(pl["layer_scale_2"]["scale"], np.float32)
        if "cross_attn" in pl:
            ca = f"{lp}.cross_attention"
            state[f"{ca}.in_proj_weight_q"] = _lin(pl["cross_attn"]["q_proj"])
            state[f"{ca}.in_proj_weight_kv"] = _lin(pl["cross_attn"]["kv_proj"])
            state[f"{ca}.out_proj.weight"] = _lin(pl["cross_attn"]["out_proj"])
        if "cross_attn_gate" in pl:
            ca = f"{lp}.cross_attention"
            g = pl["cross_attn_gate"]
            if "alpha" in g:
                state[f"{ca}.gate.alpha"] = np.asarray(g["alpha"], np.float32)
            else:
                state[f"{ca}.gate.alpha.0.weight"] = _lin(g["in_proj"])
                state[f"{ca}.gate.alpha.2.weight"] = _lin(g["out_proj"])
                if "bias" in g:
                    state[f"{ca}.gate.alpha.2.bias"] = np.asarray(g["bias"], np.float32)
        if "norm_cross" in pl:
            _norm_out(state, f"{lp}.norm_cross", pl["norm_cross"],
                      cfg.cross_attention_norm)


def lm_params_to_torch_state(model, params: dict) -> dict:
    """Full inverse of loaders.lm_params_from_torch_state (f32 tensors)."""
    c = model.config
    state: dict = {}
    _emb_out(state, "text_emb", params["text_emb"])
    for k in range(c.n_q):
        state[f"emb.{k}.weight"] = np.asarray(
            _dense(params["emb"]["weight"])[k], np.float32)
    tcfg = c.transformer_config
    transformer_layers_to_torch(state, "transformer",
                                params["transformer"]["layers"], tcfg)
    if "cross_attn_shared" in params["transformer"]:
        # shared projections materialize on every layer (rust reads layer 0)
        sh = params["transformer"]["cross_attn_shared"]
        for l in range(tcfg.num_layers):
            ca = f"transformer.layers.{l}.cross_attention"
            state[f"{ca}.in_proj_weight_q"] = _lin(sh["q_proj"])
            state[f"{ca}.in_proj_weight_kv"] = _lin(sh["kv_proj"])
            state[f"{ca}.out_proj.weight"] = _lin(sh["out_proj"])
    _norm_out(state, "out_norm", params["out_norm"], c.norm)
    state["text_linear.weight"] = _lin(params["text_linear"]["weight"])
    if "extra_heads" in params:
        for i in range(c.extra_heads_num_heads):
            state[f"extra_heads.{i}.weight"] = _lin(params["extra_heads"]["weight"][i])
    if model.depformer is not None:
        for i in range(c.num_depformer_in):
            state[f"depformer_in.{i}.weight"] = _lin(params["depformer_in"]["weight"][i])
        _emb_out(state, "depformer_text_emb", params["depformer_text_emb"])
        demb = params["depformer_emb"]
        for k in range(c.dep_q - 1):
            p = {"weight": demb["weight"][k]}
            if "low_rank" in demb:
                p["low_rank"] = demb["low_rank"][k]
            _emb_out(state, f"depformer_emb.{k}", p)
        transformer_layers_to_torch(state, "depformer",
                                    params["depformer"]["layers"],
                                    c.depformer_config)
        for k in range(c.dep_q):
            state[f"linears.{k}.weight"] = _lin(params["linears"]["weight"][k])
    return state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir")
    parser.add_argument("out", type=Path)
    args = parser.parse_args()
    from moshi_tpu.models.loaders import CheckpointInfo
    info = CheckpointInfo.from_dir(args.checkpoint_dir)
    model, params = info.get_moshi(dtype=jnp.float32)
    state = lm_params_to_torch_state(model, params)
    from safetensors.numpy import save_file
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, str(args.out))
    print(f"exported {len(state)} tensors to {args.out}")


if __name__ == "__main__":
    main()
