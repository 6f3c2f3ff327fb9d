"""RVQ correctness: brute-force nearest-centroid check and behavioral parity
against the reference SplitResidualVectorQuantizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.quantization.vq import (RVQConfig, ResidualVectorQuantizer,
                                       SplitResidualVectorQuantizer,
                                       nearest_codebook)


def test_nearest_codebook_bruteforce():
    rs = np.random.RandomState(0)
    x = rs.randn(17, 8).astype(np.float32)
    emb = rs.randn(32, 8).astype(np.float32)
    codes = np.asarray(nearest_codebook(jnp.asarray(x), jnp.asarray(emb)))
    d = ((x[:, None] - emb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(codes, d.argmin(-1))


def test_rvq_roundtrip_reduces_error():
    cfg = RVQConfig(dimension=8, input_dimension=8, output_dimension=8,
                    n_q=4, bins=64, force_projection=False)
    q = ResidualVectorQuantizer(cfg)
    params = q.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 8))
    codes = q.encode(params, x)
    assert codes.shape == (2, 4, 10)
    y = q.decode(params, codes)
    e_full = float(jnp.mean((x - y) ** 2))
    y1 = q.decode(params, codes[:, :1])
    e_one = float(jnp.mean((x - y1) ** 2))
    assert e_full < e_one


def test_parity_with_reference():
    torch = pytest.importorskip("torch")
    from refutil import import_reference, state_dict_to_numpy
    import_reference()
    from moshi.quantization.vq import SplitResidualVectorQuantizer as RefSplit

    torch.manual_seed(0)
    kw = dict(dimension=16, input_dimension=24, output_dimension=24, n_q=5,
              bins=32)
    rq = RefSplit(**kw)
    rq.eval()
    # Fill the EMA buffers with plausible values so embeddings are non-trivial.
    with torch.no_grad():
        for rvq in (rq.rvq_first, rq.rvq_rest):
            for layer in rvq.vq.layers:
                cb = layer._codebook
                cb.embedding_sum.normal_()
                cb.cluster_usage.uniform_(0.5, 2.0)
                cb._initialized.fill_(1)

    state = {k: jnp.asarray(v) for k, v in state_dict_to_numpy(rq).items()}
    from moshi_tpu.models.loaders import _rvq_params
    cfg = RVQConfig(dimension=16, input_dimension=24, output_dimension=24,
                    n_q=5, bins=32)
    q = SplitResidualVectorQuantizer(cfg)
    params = {"rvq_first": _rvq_params(state, "rvq_first", 1),
              "rvq_rest": _rvq_params(state, "rvq_rest", 4)}

    x = np.random.RandomState(0).randn(2, 24, 9).astype(np.float32)  # [B, C, T]
    with torch.no_grad():
        codes_ref = rq.encode(torch.from_numpy(x)).numpy()
        y_ref = rq.decode(torch.from_numpy(codes_ref)).numpy()

    codes = q.encode(params, jnp.asarray(x).transpose(0, 2, 1))
    np.testing.assert_array_equal(np.asarray(codes), codes_ref)
    y = q.decode(params, jnp.asarray(codes_ref))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-4, atol=1e-5)
