"""Byte-accounting for the batched-ASR frame at high batch (VERDICT r4 #8).

BENCH_TTS_ASR.md: B=448 int4-KV ctx-750 runs 59.9 ms; B=512 compiles but
jumps to 207 ms — an HBM allocation/layout problem, not FLOPs.  This probe
AOT-compiles the two jitted programs of the frame (mimi encode_step and the
LM _device_step) at a given batch and prints XLA's own memory analysis
(argument/output/temp/alias bytes) next to a host-side accounting of the
live state and params, so the spill has a named owner.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/asr_hbm_audit.py \
        --batch 512 --kv-cache int4 --context 750 --weights int8 \
        --mimi-dtype bf16 [--tpu]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def tree_bytes(tree) -> int:
    import jax
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "dtype"))


def top_leaves(tree, n=12):
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    rows = [(jax.tree_util.keystr(k), tuple(v.shape), str(v.dtype),
             v.size * v.dtype.itemsize)
            for k, v in flat if hasattr(v, "dtype")]
    rows.sort(key=lambda r: -r[3])
    return rows[:n]


def fmt(b):
    return f"{b / (1 << 30):7.3f} GiB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--model", default="asr_300m_202501")
    ap.add_argument("--kv-cache", default="int4")
    ap.add_argument("--context", type=int, default=750)
    ap.add_argument("--weights", default="int8")
    ap.add_argument("--mimi-dtype", default="bf16")
    ap.add_argument("--mimi-chunks", type=int, default=1)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from moshi_tpu.benchmark import _preset_lm
    from moshi_tpu.utils.serving import override_lm
    from moshi_tpu.models.asr import StreamingASR
    from bench import build_mimi

    mimi_dtype = jnp.bfloat16 if args.mimi_dtype == "bf16" else jnp.float32
    lm, lm_params = _preset_lm(args.model, quantize=args.weights)
    lm = override_lm(lm, args.kv_cache, args.context)
    mimi, mimi_params = build_mimi(min(lm.config.n_q, 32), mimi_dtype)
    asr = StreamingASR(mimi, lm, args.batch, asr_delay_in_tokens=6,
                       temperature=0.0, mimi_dtype=mimi_dtype,
                       mimi_chunks=args.mimi_chunks)
    state = jax.eval_shape(
        lambda r: asr.init_state(r), jax.random.PRNGKey(0))

    print(f"batch={args.batch} kv={args.kv_cache} ctx={args.context} "
          f"weights={args.weights} mimi={args.mimi_dtype} "
          f"mimi_chunks={args.mimi_chunks}")
    print(f"lm params      {fmt(tree_bytes(lm_params))}")
    print(f"mimi params    {fmt(tree_bytes(mimi_params))}")
    print(f"state total    {fmt(tree_bytes(state))}")
    for name, sub in (("transformer", state["transformer"]),
                      ("mimi", state["mimi"])):
        print(f"  state[{name}] {fmt(tree_bytes(sub))}")
        for k, shape, dt, b in top_leaves(sub, 6):
            print(f"    {fmt(b)}  {dt:9s} {shape}  {k}")

    fs = mimi.frame_size
    tokens = jax.ShapeDtypeStruct((args.batch, 1 + asr.n_codebooks, 1),
                                  jnp.int32)
    pcm = jax.ShapeDtypeStruct((asr._mimi_bc, 1, fs), mimi_dtype)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    mimi_chunk = (state["mimi"] if args.mimi_chunks == 1
                  else state["mimi"][0])

    for label, fn, argshapes in (
        ("encode_step", asr._encode_fn,
         (mimi_params, mimi_chunk, pcm, None)),
        ("device_step", asr._step_fn,
         (lm_params, state["transformer"], tokens, rng, None)),
    ):
        lowered = fn.lower(*argshapes)
        compiled = lowered.compile()
        try:
            ma = compiled.memory_analysis()
            print(f"\n[{label}] XLA memory analysis:")
            for attr in ("argument_size_in_bytes", "output_size_in_bytes",
                         "temp_size_in_bytes", "alias_size_in_bytes",
                         "generated_code_size_in_bytes"):
                v = getattr(ma, attr, None)
                if v is not None:
                    print(f"  {attr:30s} {fmt(v)}")
            tot = (getattr(ma, "argument_size_in_bytes", 0)
                   + getattr(ma, "output_size_in_bytes", 0)
                   + getattr(ma, "temp_size_in_bytes", 0)
                   - getattr(ma, "alias_size_in_bytes", 0))
            print(f"  {'peak (arg+out+temp-alias)':30s} {fmt(tot)}")
        except Exception as e:  # CPU backend has no memory_analysis
            print(f"[{label}] memory_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
