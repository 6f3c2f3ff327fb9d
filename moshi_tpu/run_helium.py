"""Text-only LM generation (Helium runner).

Behavioral reference: `moshi_mlx/moshi_mlx/run_helium.py` — a plain
autoregressive text LM served by the same transformer stack (no audio
codebooks, no depformer).  The prompt is prefilled in one chunk through the
streaming state, then tokens are sampled one step at a time inside jit.

Usage: python -m moshi_tpu.run_helium --checkpoint-dir DIR --prompt "..." -n 100
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .models.loaders import CheckpointInfo
from .utils.sampling import sample_token


def generate_text(lm, params, prompt_ids: list[int], num_steps: int,
                  rng: jax.Array, temp: float = 0.7, top_k: int = 50,
                  dtype=jnp.bfloat16) -> list[int]:
    assert lm.config.n_q == 0 and lm.config.dep_q == 0, "text-only LM expected"
    B = 1
    state = lm.transformer.init_state(B, dtype)

    prompt = jnp.asarray(prompt_ids, jnp.int32)[None, None, :]  # [1, K=1, T]
    h, logits, state = jax.jit(lm.forward_text_step)(params, state, prompt)
    last_logits = logits[:, 0, -1]

    @jax.jit
    def step(params, state, token, rng):
        h, logits, state = lm.forward_text_step(params, state, token[:, None, None])
        rng, krng = jax.random.split(rng)
        nxt = sample_token(krng, logits[:, 0, 0], use_sampling=temp > 0,
                           temp=temp, top_k=top_k)
        return nxt, state, rng

    rng, krng = jax.random.split(rng)
    token = sample_token(krng, last_logits, use_sampling=temp > 0, temp=temp,
                         top_k=top_k)
    out = [int(token[0])]
    for _ in range(num_steps - 1):
        token, state, rng = step(params, state, token, rng)
        out.append(int(token[0]))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--prompt", default="Hello")
    parser.add_argument("-n", "--num-steps", type=int, default=100)
    parser.add_argument("--temp", type=float, default=0.7)
    parser.add_argument("--top-k", type=int, default=50)
    args = parser.parse_args()

    info = CheckpointInfo.from_dir(args.checkpoint_dir)
    lm, params = info.get_moshi()
    from .text.spm import SentencePieceTokenizer
    tok = SentencePieceTokenizer(Path(args.checkpoint_dir) / info.tokenizer_name)

    ids = tok.encode(args.prompt)
    out = generate_text(lm, params, ids, args.num_steps, jax.random.PRNGKey(0),
                        args.temp, args.top_k)
    print(args.prompt + tok.decode(out))


if __name__ == "__main__":
    main()
