"""Compute TTS voice-conditioning embeddings from audio files.

Behavioral reference: `scripts/tts_make_voice.py` in the reference repo —
the embedding is the *unquantized* Mimi latent of (up to) `--duration`
seconds of audio, saved as `speaker_wavs` in a safetensors file (the voice
files consumed by `TTSModel.make_condition_attributes`).

Usage:
  python scripts/tts_make_voice.py --mimi-weight VOICE_MIMI.safetensors \\
      [--duration 10] [--suffix .SIG@EPOCH.safetensors] file.wav ...
"""

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mimi-weight", required=True,
                        help="voice-variant Mimi checkpoint (…_mimi_voice.safetensors)")
    parser.add_argument("--duration", type=float, default=10.0)
    parser.add_argument("--num-codebooks", type=int, default=16)
    parser.add_argument("--suffix", default=".safetensors")
    parser.add_argument("-o", "--out", type=Path, default=None)
    parser.add_argument("files", nargs="+", type=Path)
    args = parser.parse_args()

    from moshi_tpu.models.loaders import get_mimi
    from moshi_tpu import audio

    mimi, params = get_mimi(args.mimi_weight, num_codebooks=args.num_codebooks)

    for file in args.files:
        out_folder = file.parent if args.out is None else args.out
        out_folder.mkdir(exist_ok=True, parents=True)
        out_file = out_folder / (file.name + args.suffix)
        wav, _ = audio.read_wav(file, sample_rate=mimi.sample_rate)
        wav = wav.mean(axis=0)  # mono
        length = int(mimi.sample_rate * args.duration)
        wav = wav[:length]
        wav = np.pad(wav, (0, length - wav.shape[-1]))
        emb = mimi.encode_to_latent(params, jnp.asarray(wav)[None, None],
                                    quantize=False)
        # saved as [1, D, T] to match the reference layout (encode_to_latent
        # in torch returns channel-first)
        emb = jnp.transpose(emb, (0, 2, 1))
        from safetensors.flax import save_file
        save_file({"speaker_wavs": emb}, str(out_file))
        print(f"wrote {out_file} ({emb.shape})")


if __name__ == "__main__":
    main()
