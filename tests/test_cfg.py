"""CFG greedy-decode parity with the reference LMGen (the no-text null
variant used by TTS, lm.py:713-732)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import LMModel, UNGENERATED_TOKEN
from moshi_tpu.models.lm_gen import LMGen, LMGenConfig
from test_lm import tiny_lm_config, _build_reference_lm


def test_cfg_no_text_greedy_parity():
    torch = pytest.importorskip("torch")
    from refutil import import_reference, state_dict_to_numpy
    import_reference()
    from moshi.models.lm import LMGen as RefLMGen

    cfg = tiny_lm_config()
    ref = _build_reference_lm(torch, cfg)
    ref_gen = RefLMGen(ref, use_sampling=False, cfg_coef=2.0, cfg_is_no_text=True)

    from moshi_tpu.models.loaders import lm_params_from_torch_state
    state_np = {k: jnp.asarray(v) for k, v in state_dict_to_numpy(ref).items()}
    model = LMModel(cfg)
    params = lm_params_from_torch_state(model, state_np, dtype=jnp.float32)
    gen = LMGen(model, LMGenConfig(use_sampling=False, cfg_coef=2.0,
                                   cfg_is_no_text=True))

    B, T = 1, 10
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    rs = np.random.RandomState(0)
    tokens = rs.randint(0, cfg.card, (B, n_in, T)).astype(np.int64)

    outs_ref = []
    with torch.no_grad(), ref_gen.streaming(B):
        for t in range(T):
            o = ref_gen.step(torch.from_numpy(tokens[:, :, t:t + 1]))
            outs_ref.append(None if o is None else o.numpy())

    st = gen.init_state(B, jax.random.PRNGKey(0), dtype=jnp.float32)
    step = jax.jit(gen.step)
    for t in range(T):
        o, st = step(params, st, jnp.asarray(tokens[:, :, t:t + 1], jnp.int32))
        o = np.asarray(o)
        if outs_ref[t] is None:
            assert (o == UNGENERATED_TOKEN).all(), t
        else:
            np.testing.assert_array_equal(o, outs_ref[t], err_msg=f"step {t}")
