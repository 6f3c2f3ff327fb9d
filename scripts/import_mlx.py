"""Import an MLX checkpoint (bf16 or mlx-quantized q4/q8, e.g. the published
kyutai/*-mlx-q4 repos) into the reference PyTorch safetensors naming that
moshi_tpu's loaders consume.

Behavioral references:
- name mapping: the inverse of `moshi_mlx/moshi_mlx/models/lm.py:332-413`
  (`load_pytorch_weights`);
- mlx affine quantization (`mlx.nn.quantize`): a quantized layer stores
  `weight` (uint32, `bits`-bit codes packed little-endian along the input
  dim), `scales` and `biases` with shape [out, in/group_size];
  w[o, g*gs + j] = scales[o, g] * code + biases[o, g].

Usage: python scripts/import_mlx.py MODEL.safetensors OUT_DIR \
           [--config config.json] [--dep-q 8]
"""

import argparse
import json
import re
from pathlib import Path

import numpy as np


def dequantize_mlx(wq: np.ndarray, scales: np.ndarray,
                   biases: np.ndarray) -> np.ndarray:
    """Unpack mlx affine-quantized codes.  wq: [out, in*bits/32] uint32;
    scales/biases: [out, in/gs] -> w [out, in] float32."""
    out, packed = wq.shape
    groups = scales.shape[1]
    # infer (bits, gs): in = packed*32/bits must equal groups*gs.  Try the
    # canonical mlx pairs first (q4 gs=32 / q8 gs=64, local.py:101-103) to
    # break ties like q8/gs64 vs q4/gs128.
    for bits, gs in ((4, 32), (8, 64), (8, 32), (4, 64), (4, 128), (8, 128),
                     (2, 32), (2, 64)):
        din = packed * 32 // bits
        if packed * 32 % bits == 0 and din == groups * gs:
            break
    else:
        raise ValueError(f"cannot infer quantization bits for {wq.shape} / {scales.shape}")
    per_word = 32 // bits
    mask = (1 << bits) - 1
    shifts = (np.arange(per_word, dtype=np.uint32) * bits)
    codes = (wq[:, :, None] >> shifts[None, None, :]) & mask  # [out, packed, per_word]
    codes = codes.reshape(out, din).astype(np.float32)
    w = codes.reshape(out, groups, gs) * scales[:, :, None].astype(np.float32) \
        + biases[:, :, None].astype(np.float32)
    return w.reshape(out, din)


def _collect_dequantized(state: dict) -> dict:
    """Replace (X.weight uint32, X.scales, X.biases) triples by dense
    X.weight tensors; pass everything else through as float32/int arrays."""
    out = {}
    for k, v in state.items():
        if k.endswith(".scales") or k.endswith(".biases"):
            continue
        if k.endswith(".weight") and v.dtype == np.uint32:
            base = k[: -len(".weight")]
            out[k] = dequantize_mlx(v, state[base + ".scales"],
                                    state[base + ".biases"])
        else:
            out[k] = v
    return out


def mlx_to_torch_names(state: dict, dep_q: int, depformer_num_layers: int,
                       schedule: list | None = None) -> dict:
    """Inverse of moshi_mlx load_pytorch_weights (lm.py:332-413)."""
    t: dict = {}
    dep_in_proj: dict = {}
    dep_out_proj: dict = {}

    for k, v in state.items():
        if k == "out_norm.weight":
            t["out_norm.alpha"] = v.reshape(1, 1, -1)
            continue
        m = re.match(r"audio_embs\.(\d+)\.weight", k)
        if m:
            t[f"emb.{m.group(1)}.weight"] = v
            continue
        if k.startswith("transformer."):
            m = re.match(r"(transformer\.layers\.\d+\.(?:norm1|norm2|norm_cross))\.weight", k)
            if m and v.ndim == 1:
                t[m.group(1) + ".alpha"] = v.reshape(1, 1, -1)
            else:
                t[k] = v  # in_proj.weight etc. are read as-is by the loader
            continue
        m = re.match(r"depformer\.slices\.(\d+)\.(.*)", k)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            pth_idx = schedule[i] if schedule is not None else i
            if rest == "linear_in.weight":
                t[f"depformer_in.{pth_idx}.weight"] = v
            elif rest == "linear_out.weight":
                t[f"linears.{i}.weight"] = v
            elif rest.startswith("emb."):
                sub = rest[len("emb."):]
                if i == 0:
                    t[f"depformer_text_emb.{sub}" if sub != "weight"
                      else "depformer_text_emb.weight"] = v
                else:
                    t[f"depformer_emb.{i - 1}.{sub}" if sub != "weight"
                      else f"depformer_emb.{i - 1}.weight"] = v
            else:
                m2 = re.match(r"transformer\.layers\.(\d+)\.(.*)", rest)
                if not m2:
                    continue
                lay, sub = int(m2.group(1)), m2.group(2)
                if sub in ("norm1.weight", "norm2.weight"):
                    t[f"depformer.layers.{lay}.{sub[:-7]}.alpha"] = v.reshape(1, 1, -1)
                elif sub in ("gating.linear_in.weight", "gating.linear_out.weight"):
                    which = sub.split(".")[1]
                    t[f"depformer.layers.{lay}.gating.{pth_idx}.{which}.weight"] = v
                elif sub == "self_attn.in_proj.weight":
                    dep_in_proj.setdefault(lay, {})[pth_idx] = v
                elif sub == "self_attn.out_proj.weight":
                    dep_out_proj.setdefault(lay, {})[pth_idx] = v
            continue
        t[k] = v  # text_emb*, text_linear, condition_provider, extra_heads

    # re-fuse the per-slice depformer projections into [W*out, in]
    for lay, parts in dep_in_proj.items():
        ws = [parts[i] for i in sorted(parts)]
        t[f"depformer.layers.{lay}.self_attn.in_proj_weight"] = np.concatenate(ws, 0)
    for lay, parts in dep_out_proj.items():
        ws = [parts[i] for i in sorted(parts)]
        t[f"depformer.layers.{lay}.self_attn.out_proj.weight"] = np.concatenate(ws, 0)
    return t


def import_model(model_file: Path, out_dir: Path, config: dict | None = None,
                 dep_q: int = 8, depformer_num_layers: int = 6) -> Path:
    from safetensors.numpy import load_file, save_file

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    state = load_file(str(model_file))
    state = {k: np.asarray(v) for k, v in state.items()}
    state = _collect_dequantized(state)
    schedule = None
    if config:
        dep_q = config.get("dep_q", dep_q)
        schedule = config.get("depformer_weights_per_step_schedule")
        depformer_num_layers = config.get("depformer_num_layers",
                                          depformer_num_layers)
    torch_state = mlx_to_torch_names(state, dep_q, depformer_num_layers,
                                     schedule)
    save_file({k: np.ascontiguousarray(v, np.float32)
               if v.dtype.kind == "f" else v for k, v in torch_state.items()},
              str(out_dir / "model.safetensors"))
    if config is not None:
        cfg = dict(config)
        cfg["moshi_name"] = "model.safetensors"
        (out_dir / "config.json").write_text(json.dumps(cfg, indent=2))
    return out_dir


def main():
    parser = argparse.ArgumentParser(description="Import MLX (q4/q8/bf16) checkpoints")
    parser.add_argument("model_file", type=Path)
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--config", type=Path, default=None,
                        help="reference config.json to copy alongside")
    parser.add_argument("--dep-q", type=int, default=8)
    args = parser.parse_args()
    cfg = json.loads(args.config.read_text()) if args.config else None
    out = import_model(args.model_file, args.out_dir, cfg, args.dep_q)
    print(f"imported to {out}")


if __name__ == "__main__":
    main()
