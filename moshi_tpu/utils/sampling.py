"""On-device token sampling.

Behavioral reference: `moshi/moshi/utils/sampling.py` — `sample_token` (86-106)
applies temperature then top-k (top-p optional) multinomial, or argmax when
not sampling.  Here sampling runs entirely on device with `jax.random`
(categorical over the top-k logits is distribution-identical to the
reference's renormalised top-k multinomial), so the whole LM frame step stays
inside one XLA program.
"""

import jax
import jax.numpy as jnp
from jax import lax


def sample_top_k(rng: jax.Array, logits: jax.Array, k: int, temp: float) -> jax.Array:
    """logits: [..., V] -> samples [...] via top-k + categorical."""
    k = min(k, logits.shape[-1])
    vals, idx = lax.top_k(logits, k)
    choice = jax.random.categorical(rng, vals / temp, axis=-1)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]


def sample_top_p(rng: jax.Array, logits: jax.Array, p: float, temp: float) -> jax.Array:
    """Nucleus sampling (sampling.py:67-83)."""
    probs = jax.nn.softmax(logits / temp, axis=-1)
    sort_idx = jnp.argsort(-probs, axis=-1)
    probs_sort = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(probs_sort, axis=-1)
    mask = (cum - probs_sort) > p
    logp = jnp.where(mask, -jnp.inf, jnp.log(probs_sort))
    choice = jax.random.categorical(rng, logp, axis=-1)
    return jnp.take_along_axis(sort_idx, choice[..., None], axis=-1)[..., 0]


def sample_token(rng: jax.Array, logits: jax.Array, *, use_sampling: bool = True,
                 temp: float = 1.0, top_k: int = 0, top_p: float = 0.0) -> jax.Array:
    """logits: [..., V] float -> int32 tokens [...]."""
    logits = logits.astype(jnp.float32)
    if not use_sampling or temp <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if top_p > 0.0:
        out = sample_top_p(rng, logits, top_p, temp)
    elif top_k > 0:
        out = sample_top_k(rng, logits, top_k, temp)
    else:
        out = jax.random.categorical(rng, logits / temp, axis=-1)
    return out.astype(jnp.int32)
