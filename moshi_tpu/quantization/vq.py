"""Residual vector quantization (inference path), TPU-native.

Behavioral reference:
- `moshi/moshi/quantization/core_vq.py` — `EuclideanCodebook`: the codebook
  embedding is recomputed as `embedding_sum / clamp(cluster_usage, eps)`
  (lines 179-186); encode is a nearest-centroid argmin (270-276); RVQ loops
  layers on residuals (507-528).
- `moshi/moshi/quantization/vq.py` — `ResidualVectorQuantizer` adds 1x1-conv
  input/output projections (71-93); `SplitResidualVectorQuantizer` (170-323)
  is 1 semantic RVQ + (n_q-1) acoustic RVQ, *both encoding the same input*
  (not residuals across the split — see encode at 269-279).
- The matmul argmin form `argmin(||e||^2 / 2 - x . e)` matches the reference
  GPU path (`rust/moshi-core/src/quantization.rs:125-134`) and maps the whole
  search onto the MXU; layers are iterated with `lax.scan` over a stacked
  `[n_q, bins, dim]` codebook tensor.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.matmul import dot


@dataclass(frozen=True)
class RVQConfig:
    dimension: int = 256
    input_dimension: int = 512
    output_dimension: int = 512
    n_q: int = 8
    bins: int = 2048
    force_projection: bool = True


def nearest_codebook(x: jax.Array, embedding: jax.Array) -> jax.Array:
    """x: [..., D]; embedding: [bins, D] -> int32 codes [...].

    Computed in f32 via the MXU-friendly form argmin(||e||^2/2 - x.e).
    """
    xf = x.astype(jnp.float32)
    ef = embedding.astype(jnp.float32)
    scores = 0.5 * jnp.sum(ef * ef, axis=-1) - dot(xf, ef.T)
    return jnp.argmin(scores, axis=-1).astype(jnp.int32)


class ResidualVectorQuantizer:
    """Params: {"input_proj": [Cin, D] (optional), "output_proj": [D, Cout]
    (optional), "embedding": [n_q, bins, D]} (precomputed from
    embedding_sum/cluster_usage at load time)."""

    def __init__(self, config: RVQConfig):
        self.config = config
        self.n_q = config.n_q  # active number of codebooks (static)

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        c = self.config
        k1, k2, k3 = jax.random.split(key, 3)
        p = {"embedding": jax.random.normal(k3, (c.n_q, c.bins, c.dimension), dtype)}
        if c.force_projection or c.input_dimension != c.dimension:
            p["input_proj"] = jax.random.normal(k1, (c.input_dimension, c.dimension), dtype) \
                / jnp.sqrt(c.input_dimension).astype(dtype)
        if c.force_projection or c.output_dimension != c.dimension:
            p["output_proj"] = jax.random.normal(k2, (c.dimension, c.output_dimension), dtype) \
                / jnp.sqrt(c.dimension).astype(dtype)
        return p

    def encode(self, params: dict, x: jax.Array, n_q: int | None = None) -> jax.Array:
        """x: [B, T, Cin] -> codes [B, K, T] int32."""
        n_q = self.n_q if n_q is None else n_q
        if "input_proj" in params:
            x = dot(x, params["input_proj"].astype(x.dtype))
        emb = params["embedding"][:n_q]

        def body(residual, e):
            codes = nearest_codebook(residual, e)
            quant = jnp.take(e, codes, axis=0).astype(residual.dtype)
            return residual - quant, codes

        _, codes = lax.scan(body, x, emb)  # codes: [K, B, T]
        return jnp.moveaxis(codes, 0, 1)

    def decode(self, params: dict, codes: jax.Array) -> jax.Array:
        """codes: [B, K, T] -> [B, T, Cout]."""
        K = codes.shape[1]
        emb = params["embedding"][:K]

        def gather(e, c):  # e: [bins, D], c: [B, T]
            # mode="clip": jnp.take's default fills out-of-bounds with NaN,
            # which permanently poisons the streaming decode state.  Decode
            # can see codes >= bins from hostile clients (mimi_ws rooms) or
            # from an LM whose audio card exceeds the codec bins — clamp,
            # never NaN (one bad frame must not kill a batch loop).
            return jnp.take(e, c, axis=0, mode="clip")

        quant = jax.vmap(gather, in_axes=(0, 1))(emb, codes)  # [K, B, T, D]
        quant = jnp.sum(quant, axis=0)
        if "output_proj" in params:
            quant = dot(quant, params["output_proj"].astype(quant.dtype))
        return quant

    def decode_latent_sum(self, params: dict, codes: jax.Array) -> jax.Array:
        """Sum of codebook vectors without the output projection ([B, T, D])."""
        K = codes.shape[1]
        emb = params["embedding"][:K]
        quant = jax.vmap(lambda e, c: jnp.take(e, c, axis=0, mode="clip"),
                         in_axes=(0, 1))(emb, codes)
        return jnp.sum(quant, axis=0)


class SplitResidualVectorQuantizer:
    """1 semantic RVQ + (n_q - 1) acoustic RVQ over the same input
    (quantization/vq.py:170-323)."""

    def __init__(self, config: RVQConfig, n_q_semantic: int = 1):
        assert config.n_q > n_q_semantic
        self.config = config
        self.n_q_semantic = n_q_semantic
        self.rvq_first = ResidualVectorQuantizer(
            RVQConfig(config.dimension, config.input_dimension,
                      config.output_dimension, n_q_semantic, config.bins, True))
        self.rvq_rest = ResidualVectorQuantizer(
            RVQConfig(config.dimension, config.input_dimension,
                      config.output_dimension, config.n_q - n_q_semantic,
                      config.bins, True))
        self.n_q = config.n_q  # active total

    def set_num_codebooks(self, n: int):
        assert self.n_q_semantic <= n <= self.config.n_q
        self.n_q = n
        self.rvq_rest.n_q = n - self.n_q_semantic

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        k1, k2 = jax.random.split(key)
        return {"rvq_first": self.rvq_first.init_params(k1, dtype),
                "rvq_rest": self.rvq_rest.init_params(k2, dtype)}

    def encode(self, params: dict, x: jax.Array) -> jax.Array:
        codes = self.rvq_first.encode(params["rvq_first"], x)
        if self.n_q > self.n_q_semantic:
            rest = self.rvq_rest.encode(params["rvq_rest"], x,
                                        n_q=self.n_q - self.n_q_semantic)
            codes = jnp.concatenate([codes, rest], axis=1)
        return codes

    def decode(self, params: dict, codes: jax.Array) -> jax.Array:
        quant = self.rvq_first.decode(params["rvq_first"], codes[:, : self.n_q_semantic])
        if codes.shape[1] > self.n_q_semantic:
            quant = quant + self.rvq_rest.decode(params["rvq_rest"],
                                                 codes[:, self.n_q_semantic:])
        return quant

    @property
    def cardinality(self) -> int:
        return self.config.bins
