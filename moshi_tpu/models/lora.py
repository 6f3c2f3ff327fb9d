"""LoRA adapter fusing.

Behavioral reference: `moshi/moshi/modules/lora.py` — `LoRALinear` computes
`y = x @ (W + scaling * B @ A)^T` (frozen W, A: [rank, in], B: [out, rank]);
`replace_lora_with_linear` fuses the product back into a plain linear
(lora.py:60-122).  Serving always fuses (reference server `fuse_lora=True`),
so here LoRA is a pure state-dict transformation applied before the
torch->JAX conversion: `W += scaling * B @ A` for every adapted linear.
"""

import jax.numpy as jnp


def fuse_lora_state(state: dict, lora_state: dict, scaling: float = 2.0) -> dict:
    """Fuse a LoRA safetensors state dict into the base (torch-format) state.

    Handles both split (`...in_projs.0.weight`) and fused legacy
    (`...in_proj_weight`) base naming for the attention projections.
    """
    state = dict(state)
    fused = 0
    for key in lora_state:
        if not key.endswith(".lora_A.weight"):
            continue
        base = key[: -len(".lora_A.weight")]
        A = lora_state[key]
        B = lora_state[base + ".lora_B.weight"]
        delta = (B.astype(jnp.float32) @ A.astype(jnp.float32)) * scaling
        for cand in (base + ".weight", base + "_weight"):
            if cand in state:
                w = state[cand]
                state[cand] = (w.astype(jnp.float32) + delta).astype(w.dtype)
                fused += 1
                break
        else:
            raise KeyError(f"no base weight found for LoRA adapter {base}")
    if fused == 0:
        raise ValueError("LoRA state dict contained no adapters")
    return state
