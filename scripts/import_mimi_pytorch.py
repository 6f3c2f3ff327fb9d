"""Import a research Mimi codec training checkpoint into the reference
on-disk format (mimi_config.json + mimi.safetensors).

Behavioral reference: `/root/reference/scripts/import_mimi_pytorch.py` —
drops the wavlm distillation heads, folds weight-norm (`_v`/`_g` pairs) into
plain weights, and projects the hydra config down to the mimi_config schema.

Usage: python scripts/import_mimi_pytorch.py CKPT OUT_DIR
"""

import argparse
import json
from pathlib import Path


def _to_plain(cfg):
    try:
        import omegaconf
        if isinstance(cfg, (omegaconf.DictConfig, omegaconf.ListConfig)):
            return omegaconf.OmegaConf.to_container(cfg, resolve=True)
    except ImportError:
        pass
    return cfg


def import_model(checkpoint: Path, out_folder: Path) -> Path:
    import torch
    from safetensors.torch import save_file

    out_folder = Path(out_folder)
    out_folder.mkdir(exist_ok=True, parents=True)
    pkg = torch.load(str(checkpoint), map_location="cpu", weights_only=False)
    if "xp.cfg" in pkg:
        cfg = _to_plain(pkg["xp.cfg"])
    else:
        import yaml
        cfg = yaml.safe_load(
            (Path(checkpoint).parent / ".hydra" / "config.yaml").read_text())
    model = dict(pkg["best_state"]["model"])

    for key, value in list(model.items()):
        if key.startswith("wavlm_"):
            model.pop(key)
        elif key.endswith("_v"):
            base = key[:-2]
            v = model.pop(key)
            g = model.pop(base + "_g")
            # torch._weight_norm(v, g, dim=0): w = g * v / ||v|| over dims != 0
            norm = v.norm(2, dim=tuple(range(1, v.dim())), keepdim=True)
            model[base] = g * v / norm

    config = {
        "channels": cfg["channels"],
        "sample_rate": cfg["sample_rate"],
        "frame_rate": cfg["encodec"]["frame_rate"],
    }
    seanet = dict(_to_plain(cfg["seanet"]))
    for k in ("lstm", "encoder", "decoder"):
        seanet.pop(k, None)
    seanet["norm"] = "none"
    config["seanet"] = seanet
    quant = dict(_to_plain(cfg["rvq"]))
    quant = {k: v for k, v in quant.items() if k in ("dimension", "n_q", "bins")}
    quant["input_dimension"] = seanet["dimension"]
    quant["output_dimension"] = seanet["dimension"]
    config["quantizer"] = quant
    tr = dict(_to_plain(cfg.get("transformer") or {}))
    if tr:
        config["transformer"] = tr

    (out_folder / "mimi_config.json").write_text(json.dumps(config, indent=2))
    save_file(model, str(out_folder / "mimi.safetensors"))
    return out_folder


def main():
    parser = argparse.ArgumentParser(description="Import research Mimi checkpoints")
    parser.add_argument("checkpoint", type=Path)
    parser.add_argument("out_folder", type=Path)
    args = parser.parse_args()
    out = import_model(args.checkpoint, args.out_folder)
    print(f"imported to {out}")


if __name__ == "__main__":
    main()
