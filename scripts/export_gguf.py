"""Export a moshi_tpu checkpoint to gguf (q8_0) for rust-ecosystem
consumers (`rust/moshi-core/src/lm.rs:1009-1031` loads gguf via
`gguf_file::Content::read`).

Usage: python scripts/export_gguf.py CKPT_DIR OUT.gguf [--f32]

Converts params to the torch-export tensor names (scripts/export_torch.py)
and stores 2D+ linear weights as q8_0 blocks, everything else as f32.
"""

import argparse
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir")
    parser.add_argument("out")
    parser.add_argument("--f32", action="store_true",
                        help="store everything as f32 (no quantization)")
    args = parser.parse_args()

    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.models.gguf import write_gguf
    import export_torch

    info = CheckpointInfo.from_dir(args.checkpoint_dir)
    model, params = info.get_moshi()
    state = export_torch.lm_params_to_torch_state(model, params)
    tensors = {k: np.asarray(v, np.float32) for k, v in state.items()}
    quantize = set()
    if not args.f32:
        quantize = {k for k, v in tensors.items()
                    if v.ndim >= 2 and "emb" not in k and v.shape[-1] % 32 == 0}
    write_gguf(args.out, tensors, metadata={"general.architecture": "moshi"},
               quantize=quantize)
    print(f"wrote {args.out}: {len(tensors)} tensors, {len(quantize)} q8_0")


if __name__ == "__main__":
    main()
