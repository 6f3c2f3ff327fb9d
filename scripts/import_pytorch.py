"""Import a research (hydra/omegaconf) Moshi training checkpoint into the
reference on-disk format (config.json + safetensors) that moshi_tpu's
CheckpointInfo consumes.

Behavioral reference: `/root/reference/scripts/import_pytorch.py:4-40` —
including the light-depformer support: trimming the fused weights-per-step
projections/gatings down to `--out-n-q` codebooks, low-rank embeddings, and
weight-sharing schedules.

The research package is `torch.load`-able with keys `fsdp_best_state.model`
(weights) and `xp.cfg` (config; an omegaconf object when omegaconf is
installed, a plain dict otherwise) — or a `.hydra/config.yaml` next to the
checkpoint.

Usage: python scripts/import_pytorch.py CKPT OUT_DIR [--out-n-q N]
"""

import argparse
import json
from pathlib import Path


def _to_plain(cfg):
    """omegaconf -> plain containers when omegaconf is available."""
    try:
        import omegaconf
        if isinstance(cfg, (omegaconf.DictConfig, omegaconf.ListConfig)):
            return omegaconf.OmegaConf.to_container(cfg, resolve=True)
    except ImportError:
        pass
    return cfg


def _load_cfg(pkg, checkpoint: Path) -> dict:
    if "xp.cfg" in pkg:
        return _to_plain(pkg["xp.cfg"])
    hydra = checkpoint.parent / ".hydra" / "config.yaml"
    if hydra.exists():
        import yaml
        return yaml.safe_load(hydra.read_text())
    raise ValueError("no xp.cfg in package and no .hydra/config.yaml found")


# transformer_lm keys copied verbatim into config.json
# (reference import_pytorch.py keys list)
_LM_KEYS = [
    "dim", "text_card", "existing_text_padding_id", "num_heads", "num_layers",
    "hidden_scale", "causal", "layer_scale", "context", "max_period", "gating",
    "norm", "positional_embedding", "depformer_dim", "depformer_num_heads",
    "depformer_num_layers", "depformer_dim_feedforward", "depformer_layer_scale",
    "depformer_multi_linear", "depformer_norm", "depformer_max_period",
    "depformer_gating", "depformer_pos_emb", "depformer_weights_per_step",
    "depformer_low_rank_embeddings", "demux_second_stream", "kv_repeat",
    "depformer_kv_repeat", "text_card_out",
]


def import_model(checkpoint: Path, out_folder: Path, out_n_q: int | None = None,
                 sig: str | None = None, epoch: int | None = None,
                 extra_config: dict | None = None) -> Path:
    import torch
    from safetensors.torch import save_file

    out_folder = Path(out_folder)
    out_folder.mkdir(exist_ok=True, parents=True)
    pkg = torch.load(str(checkpoint), map_location="cpu", weights_only=False)
    cfg = _load_cfg(pkg, Path(checkpoint))
    model = dict(pkg["fsdp_best_state"]["model"])

    n_q = cfg["compression_model_n_q"]
    if cfg.get("tokens", {}).get("multistream"):
        n_q *= 2
    tr = dict(cfg["transformer_lm"])
    include_depformer = bool(tr.get("depformer"))
    in_n_q = n_q
    out_n_q = (out_n_q or n_q) if include_depformer else 0

    config: dict = {"card": 2048, "n_q": in_n_q, "dep_q": out_n_q}
    delays = list(tr["delays"])
    if len(delays) < out_n_q + 1:
        delays = delays + [delays[-1]] * (out_n_q + 1 - len(delays))
    config["delays"] = delays
    for key in _LM_KEYS:
        if key in tr:
            config[key] = _to_plain(tr[key])
    if str(config.get("norm", "")).startswith("real_"):
        config["norm"] = config["norm"].removeprefix("real_")
    if cfg.get("conditioners"):
        config["conditioners"] = _to_plain(cfg["conditioners"])
    fuser = dict(_to_plain(cfg.get("fuser") or {}))
    fuser.pop("streaming_sum", None)
    if fuser:
        config["fuser"] = fuser
    config["cross_attention"] = bool(fuser.get("cross"))

    interleaver = cfg.get("interleaver") or {}
    if interleaver.get("variant") == "tts_delay":
        kw = dict(interleaver)
        kw.update(interleaver.get("tts_delay") or {})
        config["tts_config"] = {
            "audio_delay": interleaver["audio_delay"],
            "second_stream_ahead": kw.get("second_stream_ahead", 0),
            "multistream": bool(cfg.get("tokens", {}).get("multistream")),
        }

    config["model_id"] = {}
    if sig is not None:
        config["model_id"]["sig"] = sig
    if epoch is not None:
        config["model_id"]["epoch"] = epoch

    schedule = tr.get("depformer_weights_per_step_schedule")
    if schedule is not None:
        config["depformer_weights_per_step_schedule"] = list(schedule)[:out_n_q]

    if extra_config:
        config.update(extra_config)
    config["moshi_name"] = "checkpoint.safetensors"
    (out_folder / "config.json").write_text(json.dumps(config, indent=2))

    # --- trim the depformer to out_n_q codebooks (import_pytorch.py:100-135)
    if include_depformer:
        full_schedule = tr.get("depformer_weights_per_step_schedule")
        if full_schedule is None:
            full_schedule = list(range(in_n_q))
        num_weights = max(full_schedule) + 1
        kept_weights = max(full_schedule[:out_n_q]) + 1

        for idx in range(tr["depformer_num_layers"]):
            for name in ("self_attn.in_proj_weight", "self_attn.out_proj.weight"):
                key = f"depformer.layers.{idx}.{name}"
                w = model[key]
                w = w.view(num_weights, -1, *w.shape[1:])
                model[key] = w[:kept_weights].reshape(-1, *w.shape[2:]).contiguous()
        for dep_idx in range(out_n_q - 1, in_n_q - 1):
            model.pop(f"depformer_emb.{dep_idx}.weight", None)
            if tr.get("depformer_low_rank_embeddings"):
                model.pop(f"depformer_emb.{dep_idx}.low_rank.weight", None)
        for real_idx in range(kept_weights, num_weights):
            model.pop(f"depformer_in.{real_idx}.weight", None)
            for idx in range(tr["depformer_num_layers"]):
                model.pop(f"depformer.layers.{idx}.gating.{real_idx}.linear_in.weight", None)
                model.pop(f"depformer.layers.{idx}.gating.{real_idx}.linear_out.weight", None)
    for dep_idx in range(out_n_q, in_n_q):
        model.pop(f"linears.{dep_idx}.weight", None)

    save_file(model, str(out_folder / "checkpoint.safetensors"))
    return out_folder


def main():
    parser = argparse.ArgumentParser(description="Import research Moshi checkpoints")
    parser.add_argument("checkpoint", type=Path)
    parser.add_argument("out_folder", type=Path)
    parser.add_argument("--out-n-q", type=int, default=None,
                        help="codebooks to keep in the depth transformer")
    parser.add_argument("--sig", default=None)
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--extra-config", type=Path, default=None)
    args = parser.parse_args()
    extra = json.loads(args.extra_config.read_text()) if args.extra_config else None
    out = import_model(args.checkpoint, args.out_folder, args.out_n_q,
                       args.sig, args.epoch, extra)
    print(f"imported to {out}")


if __name__ == "__main__":
    main()
