"""Full-size (v0.1 hyperparameters) Mimi parity with the reference on random
weights — catches shape/config bugs the tiny config can't (ratios [8,6,5,4],
hop 480, last_kernel_size 3, d=512 transformers, stride-4 resample)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_fullsize_mimi_parity():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from refutil import import_reference, state_dict_to_numpy
    import_reference()
    from moshi.models.loaders import _mimi_config
    from moshi.models import compression as ref_compression
    from moshi.modules import SEANetEncoder as RefEnc, SEANetDecoder as RefDec
    from moshi.modules import transformer as ref_transformer
    from moshi.quantization import SplitResidualVectorQuantizer as RefSplit

    cfgd = _mimi_config
    torch.manual_seed(0)
    encoder, decoder = RefEnc(**cfgd["seanet"]), RefDec(**cfgd["seanet"])
    enc_tr = ref_transformer.ProjectedTransformer(**cfgd["transformer"])
    dec_tr = ref_transformer.ProjectedTransformer(**cfgd["transformer"])
    quantizer = RefSplit(**cfgd["quantizer"])
    with torch.no_grad():
        for rvq in (quantizer.rvq_first, quantizer.rvq_rest):
            for layer in rvq.vq.layers:
                cb = layer._codebook
                cb.embedding_sum.normal_()
                cb.cluster_usage.uniform_(0.5, 2.0)
                cb._initialized.fill_(1)
    rmimi = ref_compression.MimiModel(
        encoder, decoder, quantizer, channels=1, sample_rate=24000,
        frame_rate=12.5, encoder_frame_rate=24000 / encoder.hop_length,
        causal=True, resample_method="conv", encoder_transformer=enc_tr,
        decoder_transformer=dec_tr).eval()
    rmimi.set_num_codebooks(8)

    from moshi_tpu.models.mimi import MimiModel, mimi_v0_1_config
    from moshi_tpu.models.loaders import mimi_params_from_torch_state
    model = MimiModel(mimi_v0_1_config(num_codebooks=8))
    state = {k: jnp.asarray(v) for k, v in state_dict_to_numpy(rmimi).items()}
    params = mimi_params_from_torch_state(model, state)

    fs = model.frame_size  # 1920
    x = (np.random.RandomState(0).randn(1, 1, 2 * fs) * 0.2).astype(np.float32)
    with torch.no_grad():
        codes_ref = rmimi.encode(torch.from_numpy(x)).numpy()
        audio_ref = rmimi.decode(torch.from_numpy(codes_ref)).numpy()
    codes = np.asarray(model.encode(params, jnp.asarray(x)))
    np.testing.assert_array_equal(codes, codes_ref)
    audio = np.asarray(model.decode(params, jnp.asarray(codes_ref)))
    np.testing.assert_allclose(audio[..., : audio_ref.shape[-1]], audio_ref,
                               rtol=2e-2, atol=2e-3)
