"""Research-checkpoint importers: hydra-style torch package -> reference
on-disk format -> CheckpointInfo, round-tripped against a directly-loaded
model (reference scripts/import_pytorch.py / import_mimi_pytorch.py)."""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from test_lm import tiny_lm_config, _build_reference_lm  # noqa: E402


def _research_pkg(torch, cfg, out_path: Path):
    """Synthesize a research-format package: fused weights-per-step depformer
    projections + hydra-style cfg dict."""
    ref = _build_reference_lm(torch, cfg)
    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    W = cfg.dep_q
    # research ckpts store the per-step projections fused ([W*out, in])
    for lay in range(cfg.depformer_num_layers):
        base = f"depformer.layers.{lay}.self_attn"
        fused_in = torch.cat([sd.pop(f"{base}.in_projs.{i}.weight")
                              for i in range(W)], dim=0)
        sd[f"{base}.in_proj_weight"] = fused_in
        fused_out = torch.cat([sd.pop(f"{base}.out_projs.{i}.weight")
                               for i in range(W)], dim=0)
        sd[f"{base}.out_proj.weight"] = fused_out
    research_cfg = {
        "compression_model_n_q": cfg.n_q,
        "tokens": {"multistream": False},
        "conditioners": {},
        "fuser": {"sum": [], "cross": [], "streaming_sum": []},
        "transformer_lm": {
            "depformer": True,
            "delays": list(cfg.delays),
            "dim": cfg.dim, "text_card": cfg.text_card,
            "existing_text_padding_id": 3,
            "num_heads": cfg.num_heads, "num_layers": cfg.num_layers,
            "hidden_scale": cfg.hidden_scale, "causal": True,
            "layer_scale": None, "context": cfg.context,
            "max_period": cfg.max_period, "gating": cfg.gating,
            "norm": "real_" + cfg.norm,  # importer strips the real_ prefix
            "positional_embedding": cfg.positional_embedding,
            "depformer_dim": cfg.depformer_dim,
            "depformer_num_heads": cfg.depformer_num_heads,
            "depformer_num_layers": cfg.depformer_num_layers,
            "depformer_dim_feedforward": cfg.depformer_dim_feedforward,
            "depformer_layer_scale": None,
            "depformer_multi_linear": cfg.depformer_multi_linear,
            "depformer_max_period": 10000.0,
            "depformer_gating": cfg.depformer_gating,
            "depformer_pos_emb": cfg.depformer_pos_emb,
            "depformer_weights_per_step": True,
            "kv_repeat": 1,
        },
    }
    pkg = {"xp.cfg": research_cfg, "fsdp_best_state": {"model": sd}}
    torch.save(pkg, str(out_path))
    return ref


def test_import_pytorch_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from refutil import import_reference
    import_reference()
    import import_pytorch
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.loaders import lm_params_from_torch_state
    from refutil import state_dict_to_numpy

    # research checkpoints have a depformer slice per codebook (dep_q == n_q)
    cfg = tiny_lm_config(n_q=4, dep_q=4)
    ref = _research_pkg(torch, cfg, tmp_path / "checkpoint.th")

    out = import_pytorch.import_model(tmp_path / "checkpoint.th",
                                      tmp_path / "imported", sig="ab12cd34",
                                      epoch=100,
                                      extra_config={"card": cfg.card})
    loaded_cfg = json.loads((out / "config.json").read_text())
    assert loaded_cfg["norm"] == cfg.norm  # real_ prefix stripped
    assert loaded_cfg["n_q"] == cfg.n_q and loaded_cfg["dep_q"] == cfg.dep_q
    assert loaded_cfg["model_id"] == {"sig": "ab12cd34", "epoch": 100}
    assert not loaded_cfg["cross_attention"]

    info = CheckpointInfo.from_dir(out)
    lm, params = info.get_moshi(dtype=jnp.float32)
    assert lm.config.dim == cfg.dim and lm.config.dep_q == cfg.dep_q

    # forward parity with a direct load of the (unfused) reference weights
    direct = LMModel(cfg)
    state = {k: jnp.asarray(v) for k, v in state_dict_to_numpy(ref).items()}
    direct_params = lm_params_from_torch_state(direct, state, dtype=jnp.float32)

    rs = np.random.RandomState(0)
    codes = rs.randint(0, cfg.card, (1, cfg.num_codebooks, 5)).astype(np.int32)
    codes[:, 0] = rs.randint(0, cfg.text_card, (1, 5))
    out_a = lm.forward(params, jnp.asarray(codes))
    out_b = direct.forward(direct_params, jnp.asarray(codes))
    ma = np.asarray(out_a["text_mask"])
    np.testing.assert_allclose(np.asarray(out_a["text_logits"])[ma],
                               np.asarray(out_b["text_logits"])[ma],
                               rtol=1e-5, atol=1e-5)
    la = np.asarray(out_a["mask"])
    np.testing.assert_allclose(np.asarray(out_a["logits"])[la],
                               np.asarray(out_b["logits"])[la],
                               rtol=1e-5, atol=1e-5)


def test_import_pytorch_trims_depformer(tmp_path):
    torch = pytest.importorskip("torch")
    from refutil import import_reference
    import_reference()
    import import_pytorch
    from moshi_tpu.models.loaders import CheckpointInfo

    cfg = tiny_lm_config(n_q=4, dep_q=4)
    ref = _research_pkg(torch, cfg, tmp_path / "checkpoint.th")
    out = import_pytorch.import_model(tmp_path / "checkpoint.th",
                                      tmp_path / "trimmed", out_n_q=2,
                                      extra_config={"card": cfg.card})
    loaded_cfg = json.loads((out / "config.json").read_text())
    assert loaded_cfg["dep_q"] == 2

    info = CheckpointInfo.from_dir(out)
    lm, params = info.get_moshi(dtype=jnp.float32)
    assert lm.config.dep_q == 2
    assert params["linears"]["weight"].shape[0] == 2

    # the trimmed model's first-2-codebook logits match the full model's
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.loaders import lm_params_from_torch_state
    from refutil import state_dict_to_numpy
    direct = LMModel(cfg)
    state = {k: jnp.asarray(v) for k, v in state_dict_to_numpy(ref).items()}
    direct_params = lm_params_from_torch_state(direct, state, dtype=jnp.float32)
    rs = np.random.RandomState(0)
    codes = rs.randint(0, cfg.card, (1, cfg.num_codebooks, 5)).astype(np.int32)
    codes[:, 0] = rs.randint(0, cfg.text_card, (1, 5))
    out_t = lm.forward(params, jnp.asarray(codes))
    out_f = direct.forward(direct_params, jnp.asarray(codes))
    mt = np.asarray(out_t["mask"])
    np.testing.assert_allclose(np.asarray(out_t["logits"])[mt],
                               np.asarray(out_f["logits"][:, :2])[mt],
                               rtol=1e-5, atol=1e-5)

    # one-step generation works on the trimmed model
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig
    gen = LMGen(lm, LMGenConfig(use_sampling=False))
    st = gen.init_state(1, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jnp.zeros((1, lm.config.num_codebooks - 3, 1), jnp.int32)
    o, st = gen.step(params, st, toks)
    assert o.shape == (1, 3, 1)  # text + 2 codebooks


def test_import_mimi_pytorch_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from refutil import import_reference
    import_reference()
    import import_mimi_pytorch
    from test_server import tiny_checkpoint  # noqa: F401

    # build a tiny research-style mimi package: weight-norm split pairs +
    # wavlm heads that must be dropped
    from moshi.modules import SEANetEncoder, SEANetDecoder
    from moshi.modules import transformer as ref_transformer
    from moshi.quantization import SplitResidualVectorQuantizer
    from moshi.models import compression as ref_compression

    sn = dict(channels=1, dimension=32, causal=True, n_filters=4,
              n_residual_layers=1, activation="ELU", compress=2,
              dilation_base=2, disable_norm_outer_blocks=0, kernel_size=7,
              residual_kernel_size=3, last_kernel_size=3, norm="none",
              pad_mode="constant", ratios=[4, 3, 2], true_skip=True)
    trk = dict(d_model=32, num_heads=2, num_layers=1, causal=True,
               layer_scale=0.01, context=25, conv_layout=True,
               max_period=10000, gating="none", norm="layer_norm",
               positional_embedding="rope", dim_feedforward=64,
               input_dimension=32, output_dimensions=[32])
    qk = dict(dimension=16, n_q=4, bins=32, input_dimension=32,
              output_dimension=32)
    torch.manual_seed(0)
    quantizer = SplitResidualVectorQuantizer(**qk)
    with torch.no_grad():
        for rvq in (quantizer.rvq_first, quantizer.rvq_rest):
            for layer in rvq.vq.layers:
                cb = layer._codebook
                cb.embedding_sum.normal_()
                cb.cluster_usage.uniform_(0.5, 2.0)
                cb._initialized.fill_(1)
    rmimi = ref_compression.MimiModel(
        SEANetEncoder(**sn), SEANetDecoder(**sn), quantizer, channels=1,
        sample_rate=24000, frame_rate=12.5, encoder_frame_rate=1000,
        causal=True, resample_method="conv",
        encoder_transformer=ref_transformer.ProjectedTransformer(**trk),
        decoder_transformer=ref_transformer.ProjectedTransformer(**trk)).eval()
    sd = {k: v.clone() for k, v in rmimi.state_dict().items()}
    # split one conv weight into a weight-norm pair the importer must fold
    key = "encoder.model.0.conv.conv.weight"
    w = sd.pop(key)
    norm = w.norm(2, dim=(1, 2), keepdim=True)
    sd[key + "_g"] = norm
    sd[key + "_v"] = w / norm
    sd["wavlm_head.weight"] = torch.zeros(3, 3)

    research_cfg = {
        "channels": 1, "sample_rate": 24000,
        "encodec": {"frame_rate": 12.5},
        "seanet": {**{k: v for k, v in sn.items()
                      if k not in ("activation", "causal", "norm",
                                   "disable_norm_outer_blocks", "true_skip")},
                   "lstm": 0, "encoder": {}, "decoder": {}},
        "rvq": {**qk, "q_dropout": True},
        "transformer": {k: v for k, v in trk.items()
                        if k not in ("conv_layout", "input_dimension",
                                     "output_dimensions")},
    }
    pkg = {"xp.cfg": research_cfg, "best_state": {"model": sd}}
    torch.save(pkg, str(tmp_path / "mimi.th"))

    out = import_mimi_pytorch.import_model(tmp_path / "mimi.th",
                                           tmp_path / "imported")
    mc = json.loads((out / "mimi_config.json").read_text())
    assert mc["quantizer"] == {"dimension": 16, "n_q": 4, "bins": 32,
                               "input_dimension": 32, "output_dimension": 32}
    assert "lstm" not in mc["seanet"]

    from moshi_tpu.models.loaders import get_mimi
    mimi, params = get_mimi(out / "mimi.safetensors", mc, num_codebooks=4)
    # codes parity with the original torch model (weight-norm folded back)
    rs = np.random.RandomState(0)
    pcm = (rs.randn(1, 1, 2 * 1920) * 0.1).astype(np.float32)
    with torch.no_grad():
        codes_ref = rmimi.encode(torch.from_numpy(pcm)).numpy()
    codes = np.asarray(mimi.encode(params, jnp.asarray(pcm)))
    np.testing.assert_array_equal(codes, codes_ref)


def test_export_torch_roundtrip(tmp_path):
    """export_torch (ours -> torch names) round-trips through
    lm_params_from_torch_state bit-exactly, including a gated cross-attn
    model and a LoRA-adapted model (adapters fused on export)."""
    import jax
    import export_torch
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.loaders import lm_params_from_torch_state

    cfg = tiny_lm_config(cross_attention=True,
                         cross_attention_gating="conditional_gated_tanh",
                         cross_attention_norm="rms_norm_f32")
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(3), dtype=jnp.float32)
    state = export_torch.lm_params_to_torch_state(model, params)
    state = {k: jnp.asarray(v) for k, v in state.items()}
    back = lm_params_from_torch_state(model, state, dtype=jnp.float32)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6),
        params, back)

    # LoRA-adapted params export fused and load back as a dense model
    from moshi_tpu.models.lora import replace_all_linear_with_lora
    lp = replace_all_linear_with_lora(params, rank=2,
                                      key=jax.random.PRNGKey(4),
                                      dtype=jnp.float32)
    state2 = export_torch.lm_params_to_torch_state(model, lp)
    back2 = lm_params_from_torch_state(
        model, {k: jnp.asarray(v) for k, v in state2.items()},
        dtype=jnp.float32)
    # zero-init B -> fused == base
    np.testing.assert_allclose(
        np.asarray(back2["text_linear"]["weight"]),
        np.asarray(params["text_linear"]["weight"]), rtol=1e-5, atol=1e-6)


def _mlx_quantize(w: np.ndarray, bits: int = 4, gs: int = 32):
    """Reference mlx.nn affine quantization (per-row groups, little-endian
    packing) in numpy, for synthesizing mlx-format checkpoints."""
    out, din = w.shape
    g = w.reshape(out, din // gs, gs)
    wmin, wmax = g.min(-1, keepdims=True), g.max(-1, keepdims=True)
    n = (1 << bits) - 1
    scales = ((wmax - wmin) / n).astype(np.float32)
    scales = np.where(scales == 0, 1e-8, scales)
    biases = wmin.astype(np.float32)
    codes = np.clip(np.round((g - biases) / scales), 0, n).astype(np.uint32)
    codes = codes.reshape(out, din)
    per_word = 32 // bits
    codes = codes.reshape(out, din // per_word, per_word)
    shifts = (np.arange(per_word, dtype=np.uint32) * bits)
    packed = np.bitwise_or.reduce(codes << shifts[None, None, :], axis=-1)
    return packed.astype(np.uint32), scales[..., 0], biases[..., 0]


def test_import_mlx_dequantize_roundtrip():
    import import_mlx
    rs = np.random.RandomState(0)
    for bits, gs in ((4, 32), (8, 64)):
        w = rs.randn(16, 128).astype(np.float32)
        wq, scales, biases = _mlx_quantize(w, bits, gs)
        deq = import_mlx.dequantize_mlx(wq, scales, biases)
        err = np.abs(deq - w).max()
        step = (w.reshape(16, -1, gs).max(-1) - w.reshape(16, -1, gs).min(-1)).max() / ((1 << bits) - 1)
        assert err <= step + 1e-5, (bits, err, step)


def test_import_mlx_checkpoint(tmp_path):
    """Synthesize an mlx-format (partially q4-quantized) checkpoint from the
    tiny torch reference LM, import it, and compare forwards."""
    torch = pytest.importorskip("torch")
    from refutil import import_reference, state_dict_to_numpy
    import_reference()
    import import_mlx
    from safetensors.numpy import save_file
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.loaders import (CheckpointInfo,
                                          lm_params_from_torch_state)

    cfg = tiny_lm_config()
    ref = _build_reference_lm(torch, cfg)
    pth = {k: v.astype(np.float32) for k, v in state_dict_to_numpy(ref).items()}

    # forward-map to mlx names (moshi_mlx lm.py:332-413)
    mlx = {"out_norm.weight": pth["out_norm.alpha"][0, 0]}
    for name in ("text_emb.weight", "text_linear.weight"):
        mlx[name] = pth[name]
    for k in range(cfg.n_q):
        mlx[f"audio_embs.{k}.weight"] = pth[f"emb.{k}.weight"]
    for k, v in pth.items():
        if k.startswith("transformer"):
            if k.endswith(".alpha"):
                v = v[0, 0]
            k = k.replace(".alpha", ".weight")
            # torch tiny model stores split per-step projections; the LM main
            # transformer has W=1 so in_projs.0 == fused in_proj
            k = k.replace(".in_projs.0.weight", ".in_proj.weight")
            k = k.replace(".out_projs.0.weight", ".out_proj.weight")
            mlx[k] = v
    for i in range(cfg.dep_q):
        sp = f"depformer.slices.{i}"
        mlx[f"{sp}.linear_in.weight"] = pth[f"depformer_in.{i}.weight"]
        mlx[f"{sp}.linear_out.weight"] = pth[f"linears.{i}.weight"]
        if i == 0:
            mlx[f"{sp}.emb.weight"] = pth["depformer_text_emb.weight"]
        else:
            mlx[f"{sp}.emb.weight"] = pth[f"depformer_emb.{i - 1}.weight"]
        for lay in range(cfg.depformer_num_layers):
            p = f"{sp}.transformer.layers.{lay}"
            mlx[f"{p}.norm1.weight"] = pth[f"depformer.layers.{lay}.norm1.alpha"][0, 0]
            mlx[f"{p}.norm2.weight"] = pth[f"depformer.layers.{lay}.norm2.alpha"][0, 0]
            mlx[f"{p}.gating.linear_in.weight"] = pth[
                f"depformer.layers.{lay}.gating.{i}.linear_in.weight"]
            mlx[f"{p}.gating.linear_out.weight"] = pth[
                f"depformer.layers.{lay}.gating.{i}.linear_out.weight"]
            mlx[f"{p}.self_attn.in_proj.weight"] = pth[
                f"depformer.layers.{lay}.self_attn.in_projs.{i}.weight"]
            mlx[f"{p}.self_attn.out_proj.weight"] = pth[
                f"depformer.layers.{lay}.self_attn.out_projs.{i}.weight"]

    # quantize text_linear like mlx q4 (others stay bf16-dense)
    w = mlx.pop("text_linear.weight")
    wq, scales, biases = _mlx_quantize(w, 4, 32)
    mlx["text_linear.weight"] = wq
    mlx["text_linear.scales"] = scales
    mlx["text_linear.biases"] = biases

    save_file({k: np.ascontiguousarray(v) for k, v in mlx.items()},
              str(tmp_path / "mlx.safetensors"))
    lm_cfg_json = {
        "dim": cfg.dim, "num_heads": cfg.num_heads, "num_layers": cfg.num_layers,
        "hidden_scale": cfg.hidden_scale, "n_q": cfg.n_q, "dep_q": cfg.dep_q,
        "card": cfg.card, "text_card": cfg.text_card, "norm": cfg.norm,
        "context": cfg.context, "max_period": cfg.max_period,
        "gating": cfg.gating, "positional_embedding": cfg.positional_embedding,
        "depformer_dim": cfg.depformer_dim,
        "depformer_num_heads": cfg.depformer_num_heads,
        "depformer_num_layers": cfg.depformer_num_layers,
        "depformer_dim_feedforward": cfg.depformer_dim_feedforward,
        "depformer_gating": cfg.depformer_gating,
        "depformer_pos_emb": cfg.depformer_pos_emb,
        "depformer_multi_linear": True, "depformer_weights_per_step": True,
        "causal": True, "delays": list(cfg.delays),
    }
    out = import_mlx.import_model(tmp_path / "mlx.safetensors",
                                  tmp_path / "imported", lm_cfg_json)
    info = CheckpointInfo.from_dir(out)
    lm, params = info.get_moshi(dtype=jnp.float32)

    direct = LMModel(cfg)
    state = {k: jnp.asarray(v) for k, v in pth.items()}
    dparams = lm_params_from_torch_state(direct, state, dtype=jnp.float32)

    rs = np.random.RandomState(0)
    codes = rs.randint(0, cfg.card, (1, cfg.num_codebooks, 5)).astype(np.int32)
    codes[:, 0] = rs.randint(0, cfg.text_card, (1, 5))
    out_a = lm.forward(params, jnp.asarray(codes))
    out_b = direct.forward(dparams, jnp.asarray(codes))
    la = np.asarray(out_a["mask"])
    # audio logits don't involve the quantized text_linear: exact
    np.testing.assert_allclose(np.asarray(out_a["logits"])[la],
                               np.asarray(out_b["logits"])[la],
                               rtol=1e-5, atol=1e-5)
    # text logits only differ by the q4 error of text_linear
    mt = np.asarray(out_a["text_mask"])
    a = np.asarray(out_a["text_logits"])[mt]
    b = np.asarray(out_b["text_logits"])[mt]
    assert np.abs(a - b).max() / (np.abs(b).max() + 1e-9) < 0.1


def test_export_mlx_roundtrip(tmp_path):
    """export_mlx -> import_mlx round-trip on the tiny torch reference LM:
    exact forward parity unquantized, bounded error with q4 quantization."""
    torch = pytest.importorskip("torch")
    from refutil import import_reference, state_dict_to_numpy
    import_reference()
    import json as _json
    import export_mlx
    import import_mlx
    from safetensors.numpy import save_file
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.loaders import (CheckpointInfo,
                                          lm_params_from_torch_state)

    cfg = tiny_lm_config()
    ref = _build_reference_lm(torch, cfg)
    pth = {k: v.astype(np.float32) for k, v in state_dict_to_numpy(ref).items()}

    lm_cfg_json = {
        "dim": cfg.dim, "num_heads": cfg.num_heads, "num_layers": cfg.num_layers,
        "hidden_scale": cfg.hidden_scale, "n_q": cfg.n_q, "dep_q": cfg.dep_q,
        "card": cfg.card, "text_card": cfg.text_card, "norm": cfg.norm,
        "context": cfg.context, "max_period": cfg.max_period,
        "gating": cfg.gating, "positional_embedding": cfg.positional_embedding,
        "depformer_dim": cfg.depformer_dim,
        "depformer_num_heads": cfg.depformer_num_heads,
        "depformer_num_layers": cfg.depformer_num_layers,
        "depformer_dim_feedforward": cfg.depformer_dim_feedforward,
        "depformer_gating": cfg.depformer_gating,
        "depformer_pos_emb": cfg.depformer_pos_emb,
        "depformer_multi_linear": True, "depformer_weights_per_step": True,
        "causal": True, "delays": list(cfg.delays),
        "moshi_name": "model.safetensors",
    }
    src = tmp_path / "src"
    src.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in pth.items()},
              str(src / "model.safetensors"))
    (src / "config.json").write_text(_json.dumps(lm_cfg_json))

    direct = LMModel(cfg)
    dparams = lm_params_from_torch_state(
        direct, {k: jnp.asarray(v) for k, v in pth.items()}, dtype=jnp.float32)
    rs = np.random.RandomState(0)
    codes = rs.randint(0, 16, (1, cfg.num_codebooks, 5)).astype(np.int32)
    ref_out = direct.forward(dparams, jnp.asarray(codes))

    # q4 on a TINY random-weight model is worst-case (dim 32 = one group
    # per row, N(0,1) weights): the forward check is loose; exactness is
    # covered by the unquantized pass + the per-weight affine bound below
    for quant, rtol in ((False, 1e-6), (True, 0.35)):
        out_file = tmp_path / f"mlx_{quant}.safetensors"
        export_mlx.export_model(src, out_file, bits=4, group_size=32,
                                quantize=quant)
        imported = import_mlx.import_model(out_file,
                                           tmp_path / f"imp_{quant}",
                                           lm_cfg_json)
        info = CheckpointInfo.from_dir(imported)
        lm, params = info.get_moshi(dtype=jnp.float32)
        got = lm.forward(params, jnp.asarray(codes))
        a = np.nan_to_num(np.asarray(ref_out["text_logits"], np.float32))
        b = np.nan_to_num(np.asarray(got["text_logits"], np.float32))
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert err <= rtol, (quant, err)

    # weight-level affine bound: every q4 code is within one quantization
    # step of the original weight
    from safetensors.numpy import load_file
    mlxq = load_file(str(tmp_path / "mlx_True.safetensors"))
    wq = mlxq["text_linear.weight"]
    deq = import_mlx.dequantize_mlx(wq, mlxq["text_linear.scales"],
                                    mlxq["text_linear.biases"])
    w0 = pth["text_linear.weight"]
    step = (w0.reshape(w0.shape[0], -1, 32).max(-1)
            - w0.reshape(w0.shape[0], -1, 32).min(-1)).max() / 15
    assert np.abs(deq - w0).max() <= step + 1e-5


def test_import_helium_hf_llama(tmp_path):
    """HF Llama-style checkpoint -> import_helium -> text-only LM that
    generates through run_helium's path (reference import_helium_mlx.py)."""
    import import_helium
    from safetensors.numpy import save_file
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.run_helium import generate_text

    rs = np.random.RandomState(0)
    dim, vocab, n_layers, heads, kv_heads, hidden = 32, 64, 2, 4, 2, 32
    head_dim = dim // heads
    t = {
        "model.embed_tokens.weight": rs.randn(vocab, dim) * 0.05,
        "lm_head.weight": rs.randn(vocab, dim) * 0.05,
        "model.norm.weight": np.ones(dim) + rs.randn(dim) * 0.01,
    }
    for i in range(n_layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(dim) + rs.randn(dim) * 0.01
        t[p + "post_attention_layernorm.weight"] = np.ones(dim)
        t[p + "self_attn.q_proj.weight"] = rs.randn(dim, dim) * 0.05
        t[p + "self_attn.k_proj.weight"] = rs.randn(kv_heads * head_dim, dim) * 0.05
        t[p + "self_attn.v_proj.weight"] = rs.randn(kv_heads * head_dim, dim) * 0.05
        t[p + "self_attn.o_proj.weight"] = rs.randn(dim, dim) * 0.05
        t[p + "mlp.gate_proj.weight"] = rs.randn(hidden, dim) * 0.05
        t[p + "mlp.up_proj.weight"] = rs.randn(hidden, dim) * 0.05
        t[p + "mlp.down_proj.weight"] = rs.randn(dim, hidden) * 0.05
    save_file({k: np.ascontiguousarray(v, np.float32) for k, v in t.items()},
              str(tmp_path / "hf.safetensors"))

    out = import_helium.import_model(tmp_path / "hf.safetensors",
                                     tmp_path / "helium", num_heads=heads,
                                     context=64)
    cfg = json.loads((out / "config.json").read_text())
    assert cfg["n_q"] == 0 and cfg["dep_q"] == 0
    assert cfg["kv_repeat"] == heads // kv_heads

    info = CheckpointInfo.from_dir(out)
    lm, params = info.get_moshi(dtype=jnp.float32)
    assert lm.config.text_card == vocab
    toks = generate_text(lm, params, [1, 2, 3], num_steps=6,
                         rng=jax.random.PRNGKey(0), temp=0.0,
                         dtype=jnp.float32)
    assert len(toks) == 6
    assert all(0 <= tk < vocab for tk in toks)


def _torch_to_rust_layout(state: dict, W: int, dep_q: int,
                          dep_layers: int, schedule=None) -> dict:
    """Forward direction of reference scripts/import_rust.py: fused torch
    layout -> per-slice rust on-disk names (one full weight set per slice,
    schedule duplicates shared weights)."""
    out = {}
    for k, v in state.items():
        if not (k.startswith("depformer") or k.startswith("linears.")):
            out[k] = v
    for i in range(dep_q):
        w = schedule[i] if schedule is not None else i
        base = f"depformer.{i}."
        out[base + "linear_in.weight"] = state[f"depformer_in.{w}.weight"]
        out[base + "linear_out.weight"] = state[f"linears.{i}.weight"]
        emb = "depformer_text_emb" if i == 0 else f"depformer_emb.{i - 1}"
        out[base + "emb.weight"] = state[f"{emb}.weight"]
        for lay in range(dep_layers):
            src = f"depformer.layers.{lay}."
            dst = base + f"transformer.layers.{lay}."
            out[dst + "self_attn.in_proj_weight"] = \
                state[src + f"self_attn.in_projs.{w}.weight"]
            out[dst + "self_attn.out_proj.weight"] = \
                state[src + f"self_attn.out_projs.{w}.weight"]
            for which in ("linear_in", "linear_out"):
                out[dst + f"gating.{which}.weight"] = \
                    state[src + f"gating.{w}.{which}.weight"]
            for nrm in ("norm1", "norm2"):
                out[dst + f"{nrm}.alpha"] = state[src + f"{nrm}.alpha"]
    return out


def test_rust_layout_import():
    """Rust on-disk per-slice names (lm.rs vb.pp(slice_idx); what published
    rust safetensors/gguf checkpoints contain) load through
    lm_params_from_torch_state bit-exactly, with and without a
    weights-per-step schedule."""
    import export_torch
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.loaders import lm_params_from_torch_state

    for schedule in (None, (0, 1, 1, 2)):
        dep_q = 2 if schedule is None else 4
        over = dict(dep_q=dep_q, n_q=dep_q + 2,
                    delays=(0,) * (dep_q + 3))
        if schedule is not None:
            over["depformer_weights_per_step_schedule"] = schedule
        cfg = tiny_lm_config(**over)
        model = LMModel(cfg)
        params = model.init_params(jax.random.PRNGKey(5), dtype=jnp.float32)
        state = export_torch.lm_params_to_torch_state(model, params)
        state = {k: jnp.asarray(v) for k, v in state.items()}
        W = (max(schedule) + 1) if schedule is not None else dep_q
        rust = _torch_to_rust_layout(state, W, dep_q,
                                     cfg.depformer_num_layers,
                                     list(schedule) if schedule else None)
        back = lm_params_from_torch_state(model, rust, dtype=jnp.float32)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6),
            params, back)


def test_export_mlx_lora_fuse(tmp_path):
    """export_mlx --lora fuses adapters before the mlx name mapping
    (reference scripts/import_mlx_lora.py: get_moshi(fuse_lora=True))."""
    import export_mlx
    import export_torch
    from safetensors.numpy import save_file, load_file
    from moshi_tpu.models.lm import LMModel

    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(7), dtype=jnp.float32)
    state = export_torch.lm_params_to_torch_state(model, params)
    state = {k: np.asarray(v, np.float32) for k, v in state.items()}
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_file(state, str(ckpt / "model.safetensors"))
    (ckpt / "config.json").write_text(json.dumps(
        {"moshi_name": "model.safetensors", "dep_q": cfg.dep_q}))

    rs = np.random.RandomState(0)
    key = "text_linear.weight"
    rank, scaling = 2, 2.0
    A = rs.randn(rank, state[key].shape[1]).astype(np.float32) * 0.1
    Bw = rs.randn(state[key].shape[0], rank).astype(np.float32) * 0.1
    lora_path = tmp_path / "lora.safetensors"
    save_file({"text_linear.lora_A.weight": A,
               "text_linear.lora_B.weight": Bw}, str(lora_path))

    out = export_mlx.export_model(ckpt, tmp_path / "mlx.safetensors",
                                  quantize=False, lora_weights=lora_path,
                                  lora_scaling=scaling)
    mlx = load_file(str(out))
    np.testing.assert_allclose(mlx["text_linear.weight"],
                               state[key] + scaling * (Bw @ A),
                               rtol=1e-5, atol=1e-6)
