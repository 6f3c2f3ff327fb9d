"""Create a tiny synthetic checkpoint directory (random weights, native
format) that the real serving CLI can load on CPU:

    python scripts/make_tiny_checkpoint.py /tmp/tiny_ckpt
    python -m moshi_tpu.serve.server --checkpoint-dir /tmp/tiny_ckpt \
        --static client/

No torch needed (unlike the test fixtures, which export from actual
reference modules for parity): weights come from the models' own
`init_params`.  The Mimi is a real 24 kHz codec shape (hop 24, encoder
1000 Hz, frame rate 12.5 -> frame_size 1920), so the browser client's
AudioWorklet/opus pipeline runs against it at its native sample rate.
A synthetic unigram SPM tokenizer covering the full text_card vocab is
included so the server emits text frames.

Reference analog: none — the reference has no synthetic-checkpoint tool;
its smallest servable model is the 300M ASR.  This exists for demos,
browser drive-tests, and CI of the full `main()` path.
"""
import argparse
import json
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def spm_model_bytes(vocab: int) -> bytes:
    """A minimal unigram SentencePiece ModelProto: <unk>/<s>/</s> controls +
    whole-word pieces `▁w{i}` so every text token id decodes to a word."""
    def piece(p: str, score: float, ptype: int = 1) -> bytes:
        body = b""
        pb = p.encode("utf-8")
        body += b"\x0a" + bytes([len(pb)]) + pb            # field 1 string
        body += b"\x15" + struct.pack("<f", score)         # field 2 float
        if ptype != 1:
            body += b"\x18" + bytes([ptype])               # field 3 enum
        return b"\x0a" + bytes([len(body)]) + body         # ModelProto field 1

    pieces = [piece("<unk>", 0.0, 2), piece("<s>", 0.0, 3),
              piece("</s>", 0.0, 3)]
    for i in range(3, vocab):
        pieces.append(piece(f"▁w{i}", -float(i)))
    return b"".join(pieces)


def make(out_dir: str | Path, seed: int = 0) -> Path:
    from moshi_tpu.models.lm import LmConfig, LMModel
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.models.loaders import mimi_config_from_dict
    from moshi_tpu.models.native_ckpt import save_params

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # ---- tiny LM (same shape family as tests/test_lm.tiny_lm_config, but a
    # roomier context so demo sessions run a while before the ring wraps)
    lm_fields = dict(
        # card == quantizer bins (32): real checkpoints keep the LM audio
        # vocab equal to the mimi codebook size; a larger card would sample
        # tokens the codebook gather silently clamps (advisor r3).
        dim=32, num_heads=2, num_layers=2, hidden_scale=4.125, n_q=4,
        dep_q=2, card=32, text_card=64, norm="rms_norm_f32", context=50,
        max_period=10000.0, gating="silu", positional_embedding="rope",
        depformer_dim=16, depformer_num_heads=2, depformer_num_layers=2,
        depformer_dim_feedforward=64, depformer_gating="silu",
        depformer_pos_emb="none", depformer_multi_linear=True,
        depformer_weights_per_step=True, delays=[0, 0, 1, 0, 2])
    lm = LMModel(LmConfig(**{**lm_fields, "delays": tuple(lm_fields["delays"])}))
    lm_params = lm.init_params(jax.random.PRNGKey(seed), jnp.float32)
    save_params(out / "model.native.safetensors", lm_params)

    # ---- tiny Mimi at the real 24 kHz geometry: hop 24 -> encoder 1000 Hz,
    # frame rate 12.5 -> stride 80, frame_size 1920
    mimi_cfg = dict(
        sample_rate=24000, channels=1, frame_rate=12.5,
        seanet=dict(channels=1, dimension=32, n_filters=4,
                    n_residual_layers=1, ratios=[4, 3, 2], kernel_size=7,
                    residual_kernel_size=3, last_kernel_size=3,
                    dilation_base=2, compress=2, pad_mode="constant"),
        transformer=dict(d_model=32, num_heads=2, num_layers=1, causal=True,
                         context=25, max_period=10000, gating="none",
                         norm="layer_norm", positional_embedding="rope",
                         dim_feedforward=64, layer_scale=0.01),
        quantizer=dict(dimension=16, n_q=4, bins=32, input_dimension=32,
                       output_dimension=32))
    (out / "mimi_config.json").write_text(json.dumps(mimi_cfg))
    num_cb = max(lm_fields["dep_q"], lm_fields["n_q"] - lm_fields["dep_q"])
    mimi = MimiModel(mimi_config_from_dict(mimi_cfg, num_cb))
    mimi_params = mimi.init_params(jax.random.PRNGKey(seed + 1))
    save_params(out / "mimi.native.safetensors", mimi_params)

    (out / "tokenizer_spm_32k_3.model").write_bytes(
        spm_model_bytes(lm_fields["text_card"]))

    config = dict(lm_fields)
    config.update(
        moshi_name="model.native.safetensors",
        mimi_name="mimi.native.safetensors",
        mimi_config_name="mimi_config.json",
        tokenizer_name="tokenizer_spm_32k_3.model",
        model_type="moshi", native_format=True,
        lm_gen_config={"temp": 0.8, "temp_text": 0.7})
    (out / "config.json").write_text(json.dumps(config, indent=2))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    out = make(args.out_dir, args.seed)
    print(f"tiny checkpoint written to {out}")


if __name__ == "__main__":
    main()
