"""Cross-attention parity with the reference (TTS voice conditioning path:
transformer.py:495-531 cross-attn KV precompute, 779-786 block)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.modules.transformer import TransformerConfig, StreamingTransformer


def test_cross_attention_parity():
    torch = pytest.importorskip("torch")
    from refutil import import_reference, state_dict_to_numpy
    import_reference()
    from moshi.modules.transformer import StreamingTransformer as RefTransformer
    from moshi_tpu.models.loaders import transformer_layers_from_torch

    d, heads, layers, ctx, Ts = 32, 2, 2, 16, 5
    torch.manual_seed(0)
    rtr = RefTransformer(d_model=d, num_heads=heads, num_layers=layers,
                         dim_feedforward=128, causal=True, context=ctx,
                         positional_embedding="rope", gating="silu",
                         norm="rms_norm_f32", cross_attention=True)
    rtr.eval()

    cfg = TransformerConfig(d_model=d, num_heads=heads, num_layers=layers,
                            dim_feedforward=128, causal=True, context=ctx,
                            positional_embedding="rope", gating="silu",
                            norm="rms_norm_f32", cross_attention=True)
    tr = StreamingTransformer(cfg)
    state_np = {k: jnp.asarray(v) for k, v in state_dict_to_numpy(rtr).items()}
    params = {"layers": transformer_layers_from_torch(state_np, "", cfg)}

    B, T = 2, 8
    rs = np.random.RandomState(0)
    x = rs.randn(B, T, d).astype(np.float32)
    src = rs.randn(B, Ts, d).astype(np.float32)

    with torch.no_grad():
        y_ref = rtr(torch.from_numpy(x),
                    cross_attention_src=torch.from_numpy(src)).numpy()
    y = tr.apply(params, jnp.asarray(x), cross_src=jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)

    # streaming parity with precomputed cross KV
    with torch.no_grad(), rtr.streaming(B):
        ys_ref = [rtr(torch.from_numpy(x[:, t:t + 1]),
                      cross_attention_src=torch.from_numpy(src)).numpy()
                  for t in range(T)]
    y_ref_s = np.concatenate(ys_ref, axis=1)

    state = tr.init_state(B, dtype=jnp.float32)
    state.update(tr.precompute_cross(params["layers"], jnp.asarray(src)))
    ys = []
    for t in range(T):
        yt, state = tr.step(params, state, jnp.asarray(x[:, t:t + 1]))
        ys.append(yt)
    y_s = np.asarray(jnp.concatenate(ys, axis=1))
    np.testing.assert_allclose(y_s, y_ref_s, rtol=2e-4, atol=2e-4)
