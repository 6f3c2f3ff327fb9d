"""Export a reference checkpoint directory as a quantized (int8 or int4)
native moshi_tpu checkpoint — the analog of the reference
`scripts/export_quantized.py` / `quantize_mlx.py`.

The output directory is itself a loadable checkpoint: its config.json carries
`native_format: true`, which makes `CheckpointInfo.get_moshi/get_mimi` read
the flattened native safetensors layout (QTensor leaves included) instead of
torch-style key names.

Usage: python scripts/export_quantized.py CHECKPOINT_DIR OUT_DIR [--mode int4]
"""

import argparse
import json
import shutil
from pathlib import Path


def export(checkpoint_dir: str | Path, out_dir: str | Path,
           mode: str = "int8", min_size: int = 1 << 16) -> Path:
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.models.native_ckpt import save_params
    from moshi_tpu.utils.quantize import quantize_lm_params

    info = CheckpointInfo.from_dir(checkpoint_dir)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    lm, lm_params = info.get_moshi()
    qparams = quantize_lm_params(lm_params, mode=mode, min_size=min_size)
    moshi_name = ("model.q8.native.safetensors" if mode == "int8"
                  else "model.q4.native.safetensors")
    save_params(out / moshi_name, qparams)

    mimi, mimi_params = info.get_mimi()
    save_params(out / "mimi.native.safetensors", mimi_params)

    cfg = dict(info.raw_config or {})
    cfg["moshi_name"] = moshi_name
    cfg["mimi_name"] = "mimi.native.safetensors"
    cfg["native_format"] = True
    cfg.pop("lora_name", None)  # LoRA is fused into the exported weights
    cfg.pop("lora", None)
    (out / "config.json").write_text(json.dumps(cfg, indent=2))
    tok = Path(checkpoint_dir) / info.tokenizer_name
    if tok.exists():
        shutil.copy(tok, out / info.tokenizer_name)
    mc = info.mimi_config_name
    if mc and (Path(checkpoint_dir) / mc).exists():
        shutil.copy(Path(checkpoint_dir) / mc, out / mc)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir")
    parser.add_argument("out_dir")
    parser.add_argument("--mode", default="int8", choices=("int8", "int4"))
    args = parser.parse_args()
    out = export(args.checkpoint_dir, args.out_dir, args.mode)
    print(f"exported quantized checkpoint to {out}")


if __name__ == "__main__":
    main()
