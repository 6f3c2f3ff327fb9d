"""Streaming Mimi roundtrip sanity/benchmark on real or synthetic audio.

Analog of the reference `scripts/mimi_streaming_test.py:48-105`: streaming
encode then streaming decode, writes wavs, reports steps/s and RTF, optional
jax profiler trace.

Usage: python scripts/mimi_streaming_test.py [--weights mimi.safetensors]
           [--audio in.wav] [--seconds 8] [--out-dir /tmp] [--profile DIR]
"""

import argparse
import time
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", default=None,
                        help="Mimi safetensors checkpoint (random init if unset)")
    parser.add_argument("--audio", default=None)
    parser.add_argument("--seconds", type=float, default=8.0)
    parser.add_argument("--out-dir", default="/tmp")
    parser.add_argument("--profile", default=None,
                        help="write a jax profiler trace to this directory")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from moshi_tpu import audio as audio_io
    from moshi_tpu.models.mimi import MimiModel, mimi_v0_1_config

    if args.weights:
        from moshi_tpu.models.loaders import get_mimi
        mimi, params = get_mimi(args.weights)
    else:
        mimi = MimiModel(mimi_v0_1_config())
        params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda k: mimi.init_params(k), jax.random.PRNGKey(0)))
        print("[info] no weights given: random/zeros init (timing only)")

    sr, fs = mimi.sample_rate, mimi.frame_size
    if args.audio:
        pcm, _ = audio_io.read_wav(args.audio, sample_rate=sr)
        pcm = pcm[0]
    else:
        t = np.arange(int(sr * args.seconds)) / sr
        pcm = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    n = pcm.shape[-1] // fs
    pcm = pcm[: n * fs]

    enc = jax.jit(mimi.encode_step)
    dec = jax.jit(mimi.decode_step)
    enc_state = mimi.init_encode_state(1)
    dec_state = mimi.init_decode_state(1)

    # warmup/compile
    c, _ = enc(params, enc_state, jnp.zeros((1, 1, fs)))
    dec(params, dec_state, c)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    codes_all, out_all = [], []
    t0 = time.time()
    for i in range(n):
        chunk = jnp.asarray(pcm[i * fs:(i + 1) * fs])[None, None]
        codes, enc_state = enc(params, enc_state, chunk)
        out, dec_state = dec(params, dec_state, codes)
        codes_all.append(np.asarray(codes))
        out_all.append(np.asarray(out))
    dt = time.time() - t0
    if args.profile:
        jax.profiler.stop_trace()

    steps_per_s = n / dt
    rtf = steps_per_s / mimi.frame_rate
    print(f"{n} steps in {dt:.2f}s -> {steps_per_s:.1f} steps/s, RTF {rtf:.1f}x")

    out_pcm = np.concatenate(out_all, axis=-1)[0, 0]
    out_dir = Path(args.out_dir)
    audio_io.write_wav(out_dir / "mimi_roundtrip.wav", out_pcm, sr)
    print(f"wrote {out_dir / 'mimi_roundtrip.wav'}")


if __name__ == "__main__":
    main()
