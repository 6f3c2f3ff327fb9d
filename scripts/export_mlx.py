"""Export a reference-named (PyTorch-style) Moshi checkpoint to the MLX
format: MLX weight naming plus optional mlx-style affine quantization
(q4 gs=32 / q8 gs=64 — `moshi_mlx` local.py:101-103), so checkpoints
produced or fine-tuned here can serve on the MLX stack.

Behavioral references:
- name mapping: `moshi_mlx/moshi_mlx/models/lm.py:332-413`
  (`load_pytorch_weights`) — the exact inverse of `scripts/import_mlx.py`:
  depformer weights-per-step matrices are split per slice (shared slices
  duplicated per the schedule), norm `alpha` [1,1,D] becomes `weight` [D];
- affine quantization (`mlx.nn.quantize` semantics): per [out, group]
  `w = scales * code + biases`, codes packed little-endian into uint32
  along the input dim (`scripts/quantize_mlx.py` capability).

Usage: python scripts/export_mlx.py CKPT_DIR OUT.safetensors \
           [--bits 4] [--group-size 32] [--no-quant]
"""

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def quantize_mlx_affine(w: np.ndarray, bits: int, gs: int):
    """w [out, in] float -> (codes uint32 [out, in*bits/32], scales, biases
    [out, in/gs]), mlx affine semantics: w ~= scales*code + biases."""
    out, din = w.shape
    assert din % gs == 0, (w.shape, gs)
    levels = (1 << bits) - 1
    g = w.reshape(out, din // gs, gs).astype(np.float32)
    lo = g.min(axis=-1)
    hi = g.max(axis=-1)
    scales = np.maximum((hi - lo) / levels, 1e-8).astype(np.float32)
    biases = lo.astype(np.float32)
    codes = np.clip(np.round((g - biases[:, :, None]) / scales[:, :, None]),
                    0, levels).astype(np.uint32)
    codes = codes.reshape(out, din)
    per_word = 32 // bits
    codes = codes.reshape(out, din // per_word, per_word)
    shifts = (np.arange(per_word, dtype=np.uint32) * bits)
    packed = np.zeros((out, din // per_word), np.uint32)
    for j in range(per_word):
        packed |= codes[:, :, j] << shifts[j]
    return packed, scales, biases


def torch_to_mlx_names(state: dict, dep_q: int,
                       schedule: list | None = None) -> dict:
    """Forward `load_pytorch_weights` mapping (lm.py:332-413): the inverse
    of import_mlx.mlx_to_torch_names."""
    if schedule is None:
        schedule = list(range(dep_q))
    m: dict = {}
    # fused depformer attention projections to split per slice
    dep_attn_in: dict = {}
    dep_attn_out: dict = {}

    for k, v in state.items():
        v = np.asarray(v)
        if k == "out_norm.alpha":
            m["out_norm.weight"] = v.reshape(-1)
            continue
        mm = re.match(r"emb\.(\d+)\.weight", k)
        if mm:
            m[f"audio_embs.{mm.group(1)}.weight"] = v
            continue
        if k.startswith("transformer."):
            mm = re.match(r"(transformer\.layers\.\d+\."
                          r"(?:norm1|norm2|norm_cross))\.alpha", k)
            if mm:
                m[mm.group(1) + ".weight"] = v.reshape(-1)
            else:
                # main transformer has W=1: per-step module 0 == the weight
                k = k.replace(".in_projs.0.weight", ".in_proj.weight")
                k = k.replace(".out_projs.0.weight", ".out_proj.weight")
                m[k] = v
            continue
        mm = re.match(r"depformer_in\.(\d+)\.weight", k)
        if mm:
            p = int(mm.group(1))
            for i, s in enumerate(schedule[:dep_q]):
                if s == p:
                    m[f"depformer.slices.{i}.linear_in.weight"] = v
            continue
        mm = re.match(r"linears\.(\d+)\.weight", k)
        if mm:
            m[f"depformer.slices.{mm.group(1)}.linear_out.weight"] = v
            continue
        if k == "depformer_text_emb.weight":
            m["depformer.slices.0.emb.weight"] = v
            continue
        mm = re.match(r"depformer_emb\.(\d+)\.weight", k)
        if mm:
            m[f"depformer.slices.{int(mm.group(1)) + 1}.emb.weight"] = v
            continue
        mm = re.match(r"depformer\.layers\.(\d+)\.(.*)", k)
        if mm:
            lay, rest = int(mm.group(1)), mm.group(2)
            if rest in ("norm1.alpha", "norm2.alpha"):
                for i in range(dep_q):
                    m[f"depformer.slices.{i}.transformer.layers.{lay}."
                      f"{rest[:-6]}.weight"] = v.reshape(-1)
            elif re.match(r"gating\.(\d+)\.(linear_in|linear_out)\.weight",
                          rest):
                gm = re.match(r"gating\.(\d+)\.(linear_in|linear_out)\.weight",
                              rest)
                p, which = int(gm.group(1)), gm.group(2)
                for i, s in enumerate(schedule[:dep_q]):
                    if s == p:
                        m[f"depformer.slices.{i}.transformer.layers.{lay}."
                          f"gating.{which}.weight"] = v
            elif rest == "self_attn.in_proj_weight":
                dep_attn_in[lay] = ("fused", v)
            elif rest == "self_attn.out_proj.weight":
                dep_attn_out[lay] = ("fused", v)
            else:
                pm = re.match(r"self_attn\.(in|out)_projs\.(\d+)\.weight",
                              rest)
                if pm:
                    d = dep_attn_in if pm.group(1) == "in" else dep_attn_out
                    kind, parts = d.setdefault(lay, ("split", {}))
                    parts[int(pm.group(2))] = v
            continue
        m[k] = v  # text_emb, text_linear, condition_provider, extra_heads

    # distribute per-step projections to slices: slice i uses weight index
    # schedule[i].  Fused [W*out, in] matrices are split into W chunks
    # (chunk j = weight index j); split `in_projs.{j}` modules map directly.
    n_w = len(set(schedule[:dep_q]))

    def distribute(d, name):
        for lay, (kind, v) in d.items():
            if kind == "fused":
                chunks = np.split(v, n_w, axis=0)
            else:
                chunks = [v[j] for j in sorted(v)]
            for i, s in enumerate(schedule[:dep_q]):
                m[f"depformer.slices.{i}.transformer.layers.{lay}."
                  f"self_attn.{name}.weight"] = chunks[s]

    distribute(dep_attn_in, "in_proj")
    distribute(dep_attn_out, "out_proj")
    return m


_NO_QUANT = re.compile(r"(norm|alpha|layer_scale|learnt_padding|lora)")


def export_model(ckpt_dir: Path, out_file: Path, bits: int = 4,
                 group_size: int = 32, quantize: bool = True,
                 lora_weights: Path | None = None,
                 lora_scaling: float = 2.0) -> Path:
    from safetensors.numpy import load_file, save_file

    # the canonical mlx (bits, group_size) pairs; other pairs can be
    # ambiguous for the shape-based inference consumers use (import_mlx.py)
    assert group_size in (32, 64, 128), group_size

    ckpt_dir = Path(ckpt_dir)
    config = json.loads((ckpt_dir / "config.json").read_text())
    state = load_file(str(ckpt_dir / config.get("moshi_name",
                                                "model.safetensors")))
    state = {k: np.asarray(v) for k, v in state.items()}
    if lora_weights is not None:
        # fuse-then-export (reference scripts/import_mlx_lora.py:
        # get_moshi(fuse_lora=True) before the mlx name mapping)
        import jax.numpy as jnp
        from moshi_tpu.models.lora import fuse_lora_state
        lora = {k: jnp.asarray(v)
                for k, v in load_file(str(lora_weights)).items()}
        state = {k: jnp.asarray(v) for k, v in state.items()}
        state = fuse_lora_state(state, lora, lora_scaling)
        state = {k: np.asarray(v) for k, v in state.items()}
    dep_q = config.get("dep_q", 8)
    schedule = config.get("depformer_weights_per_step_schedule")
    mlx = torch_to_mlx_names(state, dep_q, schedule)

    out: dict = {}
    for k, v in mlx.items():
        if (quantize and k.endswith(".weight") and v.ndim == 2
                and v.shape[-1] % group_size == 0
                and not _NO_QUANT.search(k)):
            packed, scales, biases = quantize_mlx_affine(
                v.astype(np.float32), bits, group_size)
            base = k[: -len(".weight")]
            out[k] = packed
            out[base + ".scales"] = scales
            out[base + ".biases"] = biases
        else:
            out[k] = (v.astype(np.float32)
                      if v.dtype.kind == "f" else v)
    out_file = Path(out_file)
    out_file.parent.mkdir(parents=True, exist_ok=True)
    out = {k: np.ascontiguousarray(v) for k, v in out.items()}
    save_file(out, str(out_file))
    return out_file


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("ckpt_dir", type=Path,
                        help="directory with config.json + torch-named "
                             "safetensors (reference format)")
    parser.add_argument("out_file", type=Path)
    parser.add_argument("--bits", type=int, default=4, choices=(2, 4, 8))
    parser.add_argument("--group-size", type=int, default=32)
    parser.add_argument("--no-quant", action="store_true")
    parser.add_argument("--lora", type=Path, default=None,
                        help="LoRA safetensors to fuse before export "
                             "(import_mlx_lora.py analog)")
    parser.add_argument("--lora-scaling", type=float, default=2.0)
    args = parser.parse_args()
    out = export_model(args.ckpt_dir, args.out_file, args.bits,
                       args.group_size, quantize=not args.no_quant,
                       lora_weights=args.lora, lora_scaling=args.lora_scaling)
    print(f"exported to {out}")


if __name__ == "__main__":
    main()
