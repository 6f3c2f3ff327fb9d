"""On-chip cost of per-slot session snapshot/restore (batched duplex).

Builds the 7B (zeros weights) batched server state like serve_demo, runs a
few frames, then measures: snapshot extract dispatch, host offload wall
time (1/B of the batch state through the transfer tunnel), and restore
(scatter + host->device transfer) — the costs a reconnecting user pays.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_resume.py [B] [kv]
"""
import asyncio
import sys
import time
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

from moshi_tpu.models.lm import LMModel
from moshi_tpu.models.loaders import lm_config_v0_1
from moshi_tpu.models.mimi import MimiModel, mimi_v0_1_config
from moshi_tpu.utils.quantize import quantize_lm_params
from moshi_tpu.serve.batched_moshi import BatchedMoshiState

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
KV = sys.argv[2] if len(sys.argv) > 2 else "int8"

config = replace(lm_config_v0_1(), kv_cache_dtype=KV, context=3000)
lm = LMModel(config)
shapes = jax.eval_shape(
    lambda k: quantize_lm_params(lm.init_params(k, jnp.bfloat16), mode="int8"),
    jax.random.PRNGKey(0))
lm_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
mimi = MimiModel(mimi_v0_1_config(num_codebooks=config.dep_q))
mshapes = jax.eval_shape(lambda k: mimi.init_params(k, jnp.float32),
                         jax.random.PRNGKey(0))
mimi_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), mshapes)

print(f"building B={B} kv={KV} state + warmup...", flush=True)
state = BatchedMoshiState(mimi, mimi_params, lm, lm_params, None, B,
                          jax.random.PRNGKey(0))
state.warmup()


async def main():
    pcm = np.zeros((B, 1, state.frame_size), np.float32)
    mask = np.ones((B,), bool)
    for _ in range(5):
        c, m = state._put_inputs(pcm, mask)
        _, out, state.gen_state, state.enc_state, state.dec_state = \
            state._frame(state.lm_params, state.mimi_params, state.gen_state,
                         state.enc_state, state.dec_state, c, m)
    np.asarray(out)  # sync

    # snapshot: extract dispatch + full host offload (synchronous here)
    t0 = time.perf_counter()
    snap = state._extract(state.gen_state, state.enc_state, state.dec_state,
                          np.int32(0))
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    host = jax.device_get(snap)
    t_offload = time.perf_counter() - t0
    nbytes = sum(x.nbytes for x in jax.tree.leaves(host))

    # restore from host arrays (transfer + scatter) until frame-usable
    t0 = time.perf_counter()
    state.gen_state, state.enc_state, state.dec_state = state._restore(
        state.gen_state, state.enc_state, state.dec_state, host, np.int32(1))
    c, m = state._put_inputs(pcm, mask)
    _, out2, state.gen_state, state.enc_state, state.dec_state = \
        state._frame(state.lm_params, state.mimi_params, state.gen_state,
                     state.enc_state, state.dec_state, c, m)
    np.asarray(out2)
    t_restore_and_frame = time.perf_counter() - t0

    print({"B": B, "kv": KV, "snapshot_bytes_mb": round(nbytes / 2**20, 1),
           "extract_dispatch_ms": round(1000 * t_dispatch, 1),
           "offload_ms": round(1000 * t_offload, 1),
           "restore_plus_one_frame_ms": round(1000 * t_restore_and_frame, 1)})

asyncio.run(main())
