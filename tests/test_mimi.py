"""Mimi codec tests: streaming == offline token equality, and behavioral
parity against the reference MimiModel with identical (random) weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.mimi import MimiConfig, MimiModel
from moshi_tpu.modules.seanet import SEANetConfig
from moshi_tpu.modules.transformer import TransformerConfig
from moshi_tpu.quantization.vq import RVQConfig


def tiny_mimi_config() -> MimiConfig:
    """Small config: hop 24 (ratios 4,3,2), frame_size 48 @ 1 kHz-ish rates.
    sample_rate=1200, encoder rate 50, frame rate 12.5 -> stride 4."""
    seanet = SEANetConfig(channels=1, dimension=32, n_filters=4, n_residual_layers=1,
                          ratios=(4, 3, 2), kernel_size=7, residual_kernel_size=3,
                          last_kernel_size=3, dilation_base=2, compress=2,
                          pad_mode="constant")
    tr = TransformerConfig(d_model=32, num_heads=2, num_layers=2, dim_feedforward=64,
                           causal=True, context=25, positional_embedding="rope",
                           gating="none", norm="layer_norm", layer_scale=0.01)
    q = RVQConfig(dimension=16, input_dimension=32, output_dimension=32,
                  n_q=8, bins=32)
    return MimiConfig(sample_rate=1200, channels=1, frame_rate=12.5, seanet=seanet,
                      transformer=tr, quantizer=q, num_codebooks=4)


def test_streaming_encode_decode_matches_offline():
    cfg = tiny_mimi_config()
    model = MimiModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    B, nframes = 2, 6
    fs = cfg.frame_size
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, nframes * fs)) * 0.3

    codes_off = model.encode(params, x)
    audio_off = model.decode(params, codes_off)
    assert codes_off.shape == (B, cfg.num_codebooks, nframes)

    enc_state = model.init_encode_state(B)
    dec_state = model.init_decode_state(B)
    codes_s, audio_s = [], []
    for f in range(nframes):
        c, enc_state = model.encode_step(params, enc_state, x[:, :, f * fs:(f + 1) * fs])
        a, dec_state = model.decode_step(params, dec_state, c)
        codes_s.append(c)
        audio_s.append(a)
    codes_s = jnp.concatenate(codes_s, axis=2)
    audio_s = jnp.concatenate(audio_s, axis=2)

    np.testing.assert_array_equal(np.asarray(codes_s), np.asarray(codes_off))
    np.testing.assert_allclose(np.asarray(audio_s), np.asarray(audio_off),
                               rtol=1e-4, atol=1e-4)


def test_parity_with_reference_mimi():
    """Full-stack parity: build the reference MimiModel (tiny config), copy its
    random weights through the loader, require identical codes and matching
    audio, offline AND streaming."""
    torch = pytest.importorskip("torch")
    from refutil import import_reference, state_dict_to_numpy
    import_reference()
    from moshi.models import compression as ref_compression
    from moshi.modules import SEANetEncoder as RefEnc, SEANetDecoder as RefDec
    from moshi.modules import transformer as ref_transformer
    from moshi.quantization import SplitResidualVectorQuantizer as RefSplit

    cfg = tiny_mimi_config()
    sn = dict(channels=1, dimension=32, causal=True, n_filters=4,
              n_residual_layers=1, activation="ELU", compress=2, dilation_base=2,
              disable_norm_outer_blocks=0, kernel_size=7, residual_kernel_size=3,
              last_kernel_size=3, norm="none", pad_mode="constant",
              ratios=[4, 3, 2], true_skip=True)
    trk = dict(d_model=32, num_heads=2, num_layers=2, causal=True, layer_scale=0.01,
               context=25, conv_layout=True, max_period=10000, gating="none",
               norm="layer_norm", positional_embedding="rope", dim_feedforward=64,
               input_dimension=32, output_dimensions=[32])
    qk = dict(dimension=16, n_q=8, bins=32, input_dimension=32, output_dimension=32)

    torch.manual_seed(0)
    encoder, decoder = RefEnc(**sn), RefDec(**sn)
    enc_tr = ref_transformer.ProjectedTransformer(**trk)
    dec_tr = ref_transformer.ProjectedTransformer(**trk)
    quantizer = RefSplit(**qk)
    with torch.no_grad():
        for rvq in (quantizer.rvq_first, quantizer.rvq_rest):
            for layer in rvq.vq.layers:
                cb = layer._codebook
                cb.embedding_sum.normal_()
                cb.cluster_usage.uniform_(0.5, 2.0)
                cb._initialized.fill_(1)
    rmimi = ref_compression.MimiModel(
        encoder, decoder, quantizer, channels=1, sample_rate=1200, frame_rate=12.5,
        encoder_frame_rate=50, causal=True, resample_method="conv",
        encoder_transformer=enc_tr, decoder_transformer=dec_tr).eval()
    rmimi.set_num_codebooks(cfg.num_codebooks)

    model = MimiModel(cfg)
    state = {k: jnp.asarray(v) for k, v in state_dict_to_numpy(rmimi).items()}
    from moshi_tpu.models.loaders import mimi_params_from_torch_state
    params = mimi_params_from_torch_state(model, state)

    B, nframes = 1, 5
    fs = cfg.frame_size
    x = (np.random.RandomState(0).randn(B, 1, nframes * fs) * 0.3).astype(np.float32)

    with torch.no_grad():
        codes_ref = rmimi.encode(torch.from_numpy(x)).numpy()
        audio_ref = rmimi.decode(torch.from_numpy(codes_ref)).numpy()

    codes = np.asarray(model.encode(params, jnp.asarray(x)))
    np.testing.assert_array_equal(codes, codes_ref)
    audio = np.asarray(model.decode(params, jnp.asarray(codes_ref)))
    np.testing.assert_allclose(audio[..., :audio_ref.shape[-1]], audio_ref,
                               rtol=5e-3, atol=1e-4)

    # streaming parity against reference streaming mode
    with torch.no_grad(), rmimi.streaming(B):
        codes_ref_s, audio_ref_s = [], []
        for f in range(nframes):
            cs = rmimi.encode(torch.from_numpy(x[:, :, f * fs:(f + 1) * fs]))
            audio_ref_s.append(rmimi.decode(cs).numpy())
            codes_ref_s.append(cs.numpy())
    codes_ref_s = np.concatenate(codes_ref_s, axis=2)
    audio_ref_s = np.concatenate(audio_ref_s, axis=2)

    enc_state = model.init_encode_state(B)
    dec_state = model.init_decode_state(B)
    codes_s, audio_s = [], []
    for f in range(nframes):
        c, enc_state = model.encode_step(params, enc_state, jnp.asarray(x[:, :, f * fs:(f + 1) * fs]))
        a, dec_state = model.decode_step(params, dec_state, c)
        codes_s.append(np.asarray(c))
        audio_s.append(np.asarray(a))
    np.testing.assert_array_equal(np.concatenate(codes_s, 2), codes_ref_s)
    np.testing.assert_allclose(np.concatenate(audio_s, 2), audio_ref_s,
                               rtol=5e-3, atol=1e-4)


def test_bf16_mimi_serving_mode():
    """bf16 codec (the batched-serving `mimi_dtype` knob): the whole
    encode->decode streaming loop runs in bf16, produces valid codes and
    finite audio, and agrees with the f32 path on the vast majority of
    codes (RVQ argmin in bf16 may flip near-ties — that is the documented
    trade-off vs the bit-exact default)."""
    cfg = tiny_mimi_config()
    model = MimiModel(cfg)
    params32 = model.init_params(jax.random.PRNGKey(0))
    params16 = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v, params32)
    B, nframes = 2, 6
    fs = cfg.frame_size
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, nframes * fs)) * 0.3

    enc32 = model.init_encode_state(B)
    enc16 = model.init_encode_state(B, jnp.bfloat16)
    dec16 = model.init_decode_state(B, jnp.bfloat16)
    agree = total = 0
    for f in range(nframes):
        chunk = x[:, :, f * fs:(f + 1) * fs]
        c32, enc32 = model.encode_step(params32, enc32, chunk)
        c16, enc16 = model.encode_step(params16, enc16,
                                       chunk.astype(jnp.bfloat16))
        a16, dec16 = model.decode_step(params16, dec16, c16)
        assert a16.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(a16, np.float32)).all()
        assert (np.asarray(c16) >= 0).all()
        assert (np.asarray(c16) < cfg.quantizer.bins).all()
        agree += int((np.asarray(c16) == np.asarray(c32)).sum())
        total += c32.size
    assert agree / total > 0.75, f"bf16/f32 code agreement {agree}/{total}"
