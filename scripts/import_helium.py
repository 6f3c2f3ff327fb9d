"""Import a Hugging Face Llama-style text LM checkpoint (e.g.
kyutai/helium-1-preview-2b) into a moshi_tpu checkpoint directory for
`run_helium`.

Behavioral reference: `scripts/import_helium_mlx.py:13-50` — name remap
embed_tokens/lm_head/model.norm + per-layer q/k/v fusing into `in_proj`,
gate/up fusing into `gating.linear_in`.  This version also writes the
text-only `config.json` (n_q = dep_q = 0), inferring the dims from the
tensors; `--num-heads` cannot be inferred from weights and defaults to the
helium-1 2B value.

Usage: python scripts/import_helium.py model.safetensors OUT_DIR \
           [--num-heads 20] [--max-period 100000]
"""

import argparse
import json
from pathlib import Path

import numpy as np


def import_model(in_path: Path, out_dir: Path, num_heads: int = 20,
                 max_period: float = 100_000.0,
                 context: int = 4096) -> Path:
    from safetensors.numpy import load_file, save_file

    tensors = {k: np.asarray(v) for k, v in load_file(str(in_path)).items()}
    embed = tensors["model.embed_tokens.weight"]
    vocab, dim = embed.shape
    model = {
        "text_emb.weight": embed,
        "text_linear.weight": tensors.get("lm_head.weight", embed),
        "out_norm.alpha": tensors["model.norm.weight"].reshape(1, 1, -1),
    }
    n_layers = 1 + max(int(k.split(".")[2]) for k in tensors
                       if k.startswith("model.layers."))
    hidden = None
    kv_dim = None
    for i in range(n_layers):
        src = f"model.layers.{i}."
        dst = f"transformer.layers.{i}."
        model[dst + "norm1.alpha"] = \
            tensors[src + "input_layernorm.weight"].reshape(1, 1, -1)
        model[dst + "norm2.alpha"] = \
            tensors[src + "post_attention_layernorm.weight"].reshape(1, 1, -1)
        model[dst + "self_attn.out_proj.weight"] = \
            tensors[src + "self_attn.o_proj.weight"]
        model[dst + "gating.linear_out.weight"] = \
            tensors[src + "mlp.down_proj.weight"]
        gate = tensors[src + "mlp.gate_proj.weight"]
        up = tensors[src + "mlp.up_proj.weight"]
        hidden = gate.shape[0]
        model[dst + "gating.linear_in.weight"] = np.concatenate([gate, up], 0)
        q = tensors[src + "self_attn.q_proj.weight"]
        k = tensors[src + "self_attn.k_proj.weight"]
        v = tensors[src + "self_attn.v_proj.weight"]
        kv_dim = k.shape[0]
        model[dst + "self_attn.in_proj.weight"] = np.concatenate([q, k, v], 0)

    head_dim = dim // num_heads
    kv_repeat = dim // kv_dim if kv_dim else 1
    # choose hidden_scale so gating_hidden_dim(dim, scale*dim) == hidden
    # (transformer.py:50-54: hidden = 2*ff/3, or 21*dim/8 when ff == 4*dim)
    if hidden == 21 * dim // 8:
        hidden_scale = 4.0
    else:
        hidden_scale = 3.0 * hidden / (2.0 * dim)
        if int(hidden_scale * dim) == 4 * dim:
            # dodge gating_hidden_dim's ff == 4*dim special case: bump ff to
            # 4*dim + 1 (2*(4d+1)//3 still equals `hidden`).  +1.5 so the
            # float round-trip int(scale*dim) lands on 4d+1, not back on 4d.
            hidden_scale = (4 * dim + 1.5) / dim
    config = {
        "dim": dim, "text_card": vocab, "n_q": 0, "dep_q": 0, "card": 0,
        "num_heads": num_heads, "num_layers": n_layers,
        "hidden_scale": hidden_scale, "kv_repeat": kv_repeat,
        "causal": True, "context": context, "max_period": max_period,
        "gating": "silu", "norm": "rms_norm_f32",
        "positional_embedding": "rope", "delays": [0],
        "depformer_dim": 0, "depformer_num_heads": 1,
        "depformer_num_layers": 0, "depformer_multi_linear": False,
        "depformer_weights_per_step": False,
        "model_type": "helium", "moshi_name": "model.safetensors",
    }
    assert head_dim * num_heads == dim, (dim, num_heads)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v, np.float32) for k, v in
               model.items()}, str(out_dir / "model.safetensors"))
    (out_dir / "config.json").write_text(json.dumps(config, indent=2))
    return out_dir


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("model_file", type=Path,
                        help="HF transformers model.safetensors")
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--num-heads", type=int, default=20,
                        help="attention heads (helium-1 2B: 20)")
    parser.add_argument("--max-period", type=float, default=100_000.0,
                        help="rope theta")
    parser.add_argument("--context", type=int, default=4096)
    args = parser.parse_args()
    out = import_model(args.model_file, args.out_dir, args.num_heads,
                       args.max_period, args.context)
    print(f"imported to {out}")


if __name__ == "__main__":
    main()
