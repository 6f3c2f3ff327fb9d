"""RVQ training: EMA + k-means init learn codebooks that reconstruct
synthetic clustered data."""

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.quantization.vq import RVQConfig
from moshi_tpu.quantization.train import (RVQTrainConfig, init_train_state,
                                          rvq_train_forward,
                                          embedding_from_state, kmeans)


def test_kmeans_reduces_inertia():
    """Lloyd's can hit local optima (so can the reference's _run_kmeans); we
    check that the learnt means reduce quantization inertia far below the
    data variance."""
    rs = np.random.RandomState(0)
    centers = rs.randn(4, 8) * 3
    samples = np.concatenate([c + 0.05 * rs.randn(50, 8) for c in centers])
    means, bins = kmeans(jax.random.PRNGKey(0), jnp.asarray(samples, jnp.float32),
                         8, num_iters=20)
    d2 = ((samples[:, None] - np.asarray(means)[None]) ** 2).sum(-1).min(1)
    inertia = d2.mean()
    variance = ((samples - samples.mean(0)) ** 2).sum(-1).mean()
    assert inertia < 0.05 * variance, (inertia, variance)
    assert float(np.asarray(bins).sum()) == len(samples)


def test_rvq_training_reduces_error():
    cfg = RVQConfig(dimension=8, input_dimension=8, output_dimension=8,
                    n_q=2, bins=16, force_projection=False)
    tcfg = RVQTrainConfig(decay=0.9, kmeans_iters=20)
    state = init_train_state(cfg)
    params = {}
    rs = np.random.RandomState(0)
    centers = rs.randn(16, 8)

    step = jax.jit(lambda st, x, rng: rvq_train_forward(cfg, tcfg, params, st, x, rng))
    errs = []
    for i in range(30):
        x = centers[rs.randint(0, 16, 64)] + 0.02 * rs.randn(64, 8)
        x = jnp.asarray(x[None], jnp.float32)  # [1, 64, 8]
        out, state = step(state, x, jax.random.PRNGKey(i))
        q = out["quantized"]
        errs.append(float(jnp.mean(jnp.square(q - x))))
    assert errs[-1] < errs[0] * 0.5, errs[:3] + errs[-3:]
    assert float(out["entropy"]) > 0.5
    # the learnt embedding reconstructs well through the inference path
    emb = embedding_from_state(state)
    from moshi_tpu.quantization.vq import ResidualVectorQuantizer
    q = ResidualVectorQuantizer(cfg)
    infer_params = {"embedding": emb}
    x = jnp.asarray(centers[rs.randint(0, 16, 64)][None], jnp.float32)
    codes = q.encode(infer_params, x)
    y = q.decode(infer_params, codes)
    assert float(jnp.mean(jnp.square(y - x))) < 0.1
