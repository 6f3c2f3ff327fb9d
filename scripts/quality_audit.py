"""Quantized-serving quality audit (VERDICT r3 item 3).

Measures the divergence each serving knob introduces vs the bf16 baseline —
int8 KV, int4 KV, int8 weights, q4 weights, and the headline serving stack
(int8 weights + int4 KV) — driven OPEN-LOOP for thousands of greedy steps
(past the ring-KV wraparound) with identical per-step inputs and shared
random weights.  Also audits the bf16-codec knob on Mimi (encode token
agreement + decoded-PCM SNR vs f32).

Metrics per window of steps:
  text_agree / audio_agree — greedy-token agreement with the baseline
  text_kl — KL(baseline || variant) of the text softmax, mean over window

The reference bar is token-exactness (scripts/mimi_streaming_test.py:48-105);
every knob short of exact gets a measured bound here, asserted as test
thresholds in tests/test_quality_bounds.py and documented in QUALITY.md.

Usage:
  python scripts/quality_audit.py tiny --steps 4000
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_audit.py 7b \
      --steps 4000   # full-size shapes on the real chip
"""

import argparse
import json
import sys
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CHUNK = 200  # steps per device dispatch (chunked scan; tunnel sync ~30 ms)


def _pin_platform():
    # default to CPU: the axon plugin otherwise grabs the one shared TPU
    # (and tiny shapes hit Mosaic layout limits there); pass --tpu for the
    # on-chip full-size run
    if "--tpu" not in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")


_pin_platform()


def tiny_lm_config():
    from moshi_tpu.models.lm import LmConfig
    return LmConfig(
        dim=64, num_heads=4, num_layers=3, hidden_scale=4.0, n_q=4, dep_q=2,
        card=64, text_card=96, norm="rms_norm_f32", context=256,
        max_period=10000.0, gating="silu", positional_embedding="rope",
        depformer_dim=32, depformer_num_heads=2, depformer_num_layers=2,
        depformer_dim_feedforward=128, depformer_gating="silu",
        depformer_pos_emb="none", depformer_multi_linear=True,
        depformer_weights_per_step=True, delays=(0, 0, 1, 0, 1))


def flagship_config():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge
    return ge._flagship_config()


def build_variants(scale: str):
    """Returns (config, base_model, base_builder, [(name, model, builder)]).

    Scales: tiny (CPU); 2b = the dev-2B flagship shapes, bf16 baseline,
    all five knobs; 7b = Moshi-7B shapes — bf16 weights do not fit 16 GB
    HBM (CLAUDE.md), so the 7b baseline is int8-weights + bf16-KV and the
    audit isolates the KV knobs at true 7B scale.

    MEMORY STAGING (measured: eager 2b OOMed one 16 GB v5e): the bf16
    master and the quantized copies are built on the CPU backend and stay
    host-resident; each `builder()` device-puts ONE params tree, and main()
    deletes it before the next variant — at most one variant's weights are
    ever in HBM alongside the audit state."""
    import jax
    import jax.numpy as jnp
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.utils.quantize import quantize_lm_params

    if scale == "tiny":
        config = tiny_lm_config()
    elif scale == "2b":
        config = replace(flagship_config(), context=3000)
    else:
        from moshi_tpu.models.loaders import lm_config_v0_1
        config = replace(lm_config_v0_1(), context=3000)
    model = LMModel(config)
    # tiny weights are all below the production min_size threshold —
    # force quantization so the tiny audit exercises the same kernels
    min_size = 0 if scale == "tiny" else 1 << 16
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host = model.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        host = jax.tree.map(np.asarray, host)
        host_int8 = quantize_lm_params(host, min_size=min_size, mode="int8")

    default = jax.devices()[0]

    def put(tree):
        return lambda: jax.device_put(tree, default)

    mk = lambda kv: LMModel(replace(config, kv_cache_dtype=kv))  # noqa: E731
    if scale == "7b":
        # the 2B run REFUTED the old "q4 error shrinks with dim" claim
        # (KL 0.107 at 2B vs 0.04 tiny, both random weights), so q4 is
        # measured at true 7B too: vs the int8 baseline (bf16 7B does not
        # fit HBM), i.e. the drift ADDED by q4 over the int8 floor
        with jax.default_device(cpu):
            host_q4 = quantize_lm_params(host, min_size=min_size,
                                         mode="int4")
        variants = [
            ("kv_int8", mk("int8"), put(host_int8)),
            ("kv_int4_headline", mk("int4"), put(host_int8)),
            ("w_q4_vs_int8", model, put(host_q4)),
        ]
        return config, model, put(host_int8), variants
    with jax.default_device(cpu):
        host_q4 = quantize_lm_params(host, min_size=min_size, mode="int4")
    variants = [
        # control = the baseline model/params driven through the forced
        # harness: its divergence is the measurement floor (commit-path
        # asymmetry, bf16 accumulation order), to be subtracted mentally
        # from every other row
        ("control", model, put(host)),
        ("kv_int8", mk("int8"), put(host)),
        ("kv_int4", mk("int4"), put(host)),
        ("w_int8", model, put(host_int8)),
        ("w_q4", model, put(host_q4)),
        ("headline_int8w_int4kv", mk("int4"), put(host_int8)),
    ]
    return config, model, put(host), variants


def run_baseline(base_model, base_params, steps: int, seed: int = 1):
    """Free-running greedy baseline; returns (inputs, text_tokens,
    audio_tokens, text_logits) per step."""
    import jax
    import jax.numpy as jnp
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig

    gen = LMGen(base_model, LMGenConfig(use_sampling=False))

    def fn(params, state, codes):
        tt, tl, h, state = gen.main_step(params, state, codes)
        out, state = gen.depth_step(params, state, tt, h)
        return out, tl, state

    step = jax.jit(fn, donate_argnums=1)
    st = gen.init_state(1, jax.random.PRNGKey(7))
    c = base_model.config
    n_in = c.num_codebooks - c.dep_q - 1
    rs = np.random.RandomState(seed)
    inputs = rs.randint(0, c.card, size=(steps, 1, n_in, 1)).astype(np.int32)

    # CHUNKED lax.scan (not a per-step host loop): through the tunneled dev
    # TPU each host sync costs ~30+ ms — per-step recording made a 4000-step
    # pass take ~12 min; scanning CHUNK steps per dispatch makes it ~30 s.
    def chunk_fn(params, st, codes):
        def body(st, c1):
            out, tl, st = fn(params, st, c1)
            return st, (out, tl)
        return jax.lax.scan(body, st, codes)

    cstep = jax.jit(chunk_fn, donate_argnums=1)
    texts, audios, logits = [], [], []
    for t0 in range(0, steps, CHUNK):
        xs = jnp.asarray(inputs[t0:t0 + CHUNK])
        st, (out, tl) = cstep(base_params, st, xs)
        o = np.asarray(out)            # [T, 1, K, 1]
        texts.append(o[:, 0, 0, 0])
        audios.append(o[:, 0, 1:, 0])
        # f16 keeps the 7B run's 4000 x 48k logit record in host RAM
        # (~370 MB); the KL error this introduces is ~1e-4 nats
        logits.append(np.asarray(tl, np.float32)
                      .reshape(o.shape[0], -1).astype(np.float16))
    return (inputs, np.concatenate(texts), np.concatenate(audios),
            np.concatenate(logits))


def record_stream(model, params, base, steps: int):
    """FORCED-TEACHER pass: the cache always commits the BASELINE's tokens,
    so every recorded stream shares an identical token history and the
    differences between two recordings are pure kernel/precision drift —
    not the chaotic compounding a free-running comparison would show
    (generated tokens feed back through the delay cache).  The reference
    itself is recorded through this same harness, so the control
    (same model, same params) measures exactly zero.

    Returns (text_logits [T, card] f16, audio_argmax [T, dep_q])."""
    import jax
    import jax.numpy as jnp
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig

    inputs, base_text, base_audio = base
    gen = LMGen(model, LMGenConfig(use_sampling=False))

    def fn(params, state, codes, forced_text, forced_audio):
        tt, tl, h, state = gen.main_step(params, state, codes)
        # this model's own greedy audio GIVEN the baseline text...
        audio_v = model.depformer_step(params, jax.random.PRNGKey(0),
                                       forced_text, h, use_sampling=False,
                                       temp=0.0, top_k=0, cfg_coef=1.0)
        # ...but the cache commits the baseline's history
        out, state = gen.depth_step(params, state, forced_text, h,
                                    depformer_replace_tokens=forced_audio)
        return tl, audio_v, state

    # chunked scan — see run_baseline (per-step host sync dominates through
    # the tunneled dev TPU)
    def chunk_fn(params, st, xs):
        def body(st, x):
            codes, ft, fa = x
            tl, audio_v, st = fn(params, st, codes, ft, fa)
            return st, (tl, audio_v)
        return jax.lax.scan(body, st, xs)

    cstep = jax.jit(chunk_fn, donate_argnums=1)
    st = gen.init_state(1, jax.random.PRNGKey(7))
    logits, audios = [], []
    for t0 in range(0, steps, CHUNK):
        xs = (jnp.asarray(inputs[t0:t0 + CHUNK]),
              jnp.asarray(base_text[t0:t0 + CHUNK, None]),
              jnp.asarray(base_audio[t0:t0 + CHUNK, None, :, None]))
        st, (tl, audio_v) = cstep(params, st, xs)
        n = int(tl.shape[0])
        logits.append(np.asarray(tl, np.float32)
                      .reshape(n, -1).astype(np.float16))
        audios.append(np.asarray(audio_v)[:, 0])
    return np.concatenate(logits), np.concatenate(audios)


def compare_streams(ref, rec, window: int):
    """Per-window divergence of a recorded stream vs the reference
    recording: text/audio greedy agreement, margin-conditioned agreement
    (confident steps — what a trained model's decisions look like; random-
    weight logits are near-uniform so raw agreement saturates on
    tie-flips), logit MAE, and KL(ref || rec) of the text softmax."""
    ref_logits, ref_audio = ref
    rec_logits, rec_audio = rec
    steps = len(ref_logits)
    rows = []
    acc = {"text": [], "text_conf": [], "audio": [], "mae": [], "kl": []}
    for t in range(steps):
        lb = ref_logits[t].astype(np.float64)
        lv = rec_logits[t].astype(np.float64)
        agree = float(lv.argmax() == lb.argmax())
        acc["text"].append(agree)
        top2 = np.partition(lb, -2)[-2:]
        if top2[1] - top2[0] > 1.0:
            acc["text_conf"].append(agree)
        acc["audio"].append(float((rec_audio[t] == ref_audio[t]).mean()))
        acc["mae"].append(float(np.abs(lv - lb).mean()))
        pb = np.exp(lb - lb.max())
        pb /= pb.sum()
        logp_b = lb - lb.max() - np.log(np.exp(lb - lb.max()).sum())
        logp_v = lv - lv.max() - np.log(np.exp(lv - lv.max()).sum())
        acc["kl"].append(float((pb * (logp_b - logp_v)).sum()))
        if (t + 1) % window == 0 and acc["text"]:
            rows.append({
                "step": t + 1,
                "text_agree": float(np.mean(acc["text"])),
                "text_agree_confident": (float(np.mean(acc["text_conf"]))
                                         if acc["text_conf"] else None),
                "n_confident": len(acc["text_conf"]),
                "audio_agree": float(np.mean(acc["audio"])),
                "text_logit_mae": float(np.mean(acc["mae"])),
                "text_kl_mean": float(np.mean(acc["kl"])),
                "text_kl_p95": float(np.percentile(acc["kl"], 95)),
            })
            acc = {k: [] for k in acc}
    return rows


def audit_mimi(scale: str, frames: int, window: int):
    """bf16-codec knob: encode token agreement + decoded-PCM SNR vs f32,
    streaming, per window of frames."""
    import jax
    import jax.numpy as jnp
    from moshi_tpu.models.mimi import MimiModel, MimiConfig

    if scale == "tiny":
        from moshi_tpu.modules.seanet import SEANetConfig
        from moshi_tpu.modules.transformer import TransformerConfig
        from moshi_tpu.quantization.vq import RVQConfig
        cfg = MimiConfig(
            sample_rate=1200, channels=1, frame_rate=12.5,
            seanet=SEANetConfig(channels=1, dimension=32, n_filters=4,
                                n_residual_layers=1, ratios=(4, 3, 2),
                                kernel_size=7, residual_kernel_size=3,
                                last_kernel_size=3, dilation_base=2,
                                compress=2, pad_mode="constant"),
            transformer=TransformerConfig(
                d_model=32, num_heads=2, num_layers=2, dim_feedforward=64,
                causal=True, context=25, positional_embedding="rope",
                gating="none", norm="layer_norm", layer_scale=0.01),
            quantizer=RVQConfig(dimension=16, input_dimension=32,
                                output_dimension=32, n_q=8, bins=32),
            num_codebooks=4)
    else:
        cfg = MimiConfig(num_codebooks=16)
    mimi = MimiModel(cfg)
    params32 = mimi.init_params(jax.random.PRNGKey(0))
    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params32)

    enc32 = jax.jit(mimi.encode_step, donate_argnums=1)
    dec32 = jax.jit(mimi.decode_step, donate_argnums=1)
    s_e32, s_d32 = mimi.init_encode_state(1), mimi.init_decode_state(1)
    s_e16 = mimi.init_encode_state(1, dtype=jnp.bfloat16)
    s_d16 = mimi.init_decode_state(1, dtype=jnp.bfloat16)

    rs = np.random.RandomState(3)
    rows, agree, snr = [], [], []
    fs = mimi.frame_size
    for t in range(frames):
        pcm = jnp.asarray(rs.randn(1, 1, fs).astype(np.float32) * 0.3)
        c32, s_e32 = enc32(params32, s_e32, pcm)
        c16, s_e16 = enc32(params16, s_e16, pcm.astype(jnp.bfloat16))
        a32, s_d32 = dec32(params32, s_d32, c32)
        a16, s_d16 = dec32(params16, s_d16, c32.astype(jnp.int32))
        agree.append(float((np.asarray(c32) == np.asarray(c16)).mean()))
        x = np.asarray(a32, np.float64)
        n = np.asarray(a16, np.float64) - x
        snr.append(10 * np.log10(max((x ** 2).mean(), 1e-12)
                                 / max((n ** 2).mean(), 1e-12)))
        if (t + 1) % window == 0:
            rows.append({"frame": t + 1,
                         "code_agree": float(np.mean(agree)),
                         "decode_snr_db": float(np.mean(snr))})
            agree, snr = [], []
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("scale", choices=["tiny", "2b", "7b"])
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--window", type=int, default=500)
    parser.add_argument("--mimi-frames", type=int, default=1000)
    parser.add_argument("--out", default=None)
    parser.add_argument("--tpu", action="store_true",
                        help="run on the real TPU (default: CPU)")
    parser.add_argument("--skip", default="",
                        help="comma-separated variant names to skip")
    args = parser.parse_args()

    config, base_model, base_builder, variants = build_variants(args.scale)
    skip = set(args.skip.split(",")) if args.skip else set()
    report = {"scale": args.scale, "steps": args.steps, "mode": "forced",
              "context": config.context, "variants": {}}
    print("== baseline (free-running greedy, token recording)", flush=True)
    base_params = base_builder()
    inputs, text, audio, _ = run_baseline(base_model, base_params,
                                          args.steps)
    base = (inputs, text, audio)
    print("== reference (baseline through the forced harness)", flush=True)
    ref = record_stream(base_model, base_params, base, args.steps)
    del base_params  # one variant's weights in HBM at a time
    for name, model, builder in variants:
        if name in skip:
            continue
        print(f"== {name}", flush=True)
        params = builder()
        rec = record_stream(model, params, base, args.steps)
        del params
        rows = compare_streams(ref, rec, args.window)
        report["variants"][name] = rows
        for r in rows:
            print(json.dumps({"variant": name, **r}), flush=True)
    print("== mimi_bf16", flush=True)
    rows = audit_mimi(args.scale, args.mimi_frames, max(args.window // 2, 1))
    report["variants"]["mimi_bf16"] = rows
    for r in rows:
        print(json.dumps({"variant": "mimi_bf16", **r}), flush=True)

    out = args.out or f"quality_{args.scale}.json"
    Path(out).write_text(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
