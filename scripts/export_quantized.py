"""Export a reference checkpoint directory as a quantized (int8) native
moshi_tpu checkpoint — the analog of the reference `scripts/export_quantized.py`.

Usage: python scripts/export_quantized.py CHECKPOINT_DIR OUT_DIR
"""

import argparse
import json
import shutil
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir")
    parser.add_argument("out_dir")
    args = parser.parse_args()

    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.models.native_ckpt import save_params
    from moshi_tpu.utils.quantize import quantize_lm_params

    info = CheckpointInfo.from_dir(args.checkpoint_dir)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    lm, lm_params = info.get_moshi()
    qparams = quantize_lm_params(lm_params)
    save_params(out / "model.q8.native.safetensors", qparams)

    mimi, mimi_params = info.get_mimi()
    save_params(out / "mimi.native.safetensors", mimi_params)

    cfg = dict(info.raw_config or {})
    cfg["moshi_name"] = "model.q8.native.safetensors"
    cfg["mimi_name"] = "mimi.native.safetensors"
    cfg["native_format"] = True
    (out / "config.json").write_text(json.dumps(cfg, indent=2))
    tok = Path(args.checkpoint_dir) / info.tokenizer_name
    if tok.exists():
        shutil.copy(tok, out / info.tokenizer_name)
    print(f"exported quantized checkpoint to {out}")


if __name__ == "__main__":
    main()
