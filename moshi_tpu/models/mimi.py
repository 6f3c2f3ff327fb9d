"""Mimi: streaming neural audio codec (24 kHz mono <-> 12.5 Hz RVQ tokens).

Behavioral reference: `moshi/moshi/models/compression.py` (`MimiModel`,
105-433): encoder -> encoder transformer -> downsample 50->12.5 Hz -> RVQ;
decode reverses with a channel-wise transposed upsample.  Canonical
hyper-parameters from `moshi/moshi/models/loaders.py:38-88` and
`rust/moshi-core/src/mimi.rs:32-91`.

Public API mirrors the reference tensor shapes ([B, C, T] audio,
[B, K, T] codes); internally everything is channels-last.  Streaming state is
one pytree; `encode_step`/`decode_step` are pure and jittable — the TPU
equivalent of the reference's CUDA-graphed streaming path
(compression.py:219-230).
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..modules.seanet import SEANetConfig, SEANetEncoder, SEANetDecoder
from ..modules.transformer import TransformerConfig, ProjectedTransformer
from ..modules.resample import ConvDownsample1d, ConvTrUpsample1d
from ..quantization.vq import RVQConfig, SplitResidualVectorQuantizer


@dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24_000
    channels: int = 1
    frame_rate: float = 12.5
    seanet: SEANetConfig = field(default_factory=SEANetConfig)
    transformer: TransformerConfig = field(default_factory=lambda: TransformerConfig(
        d_model=512, num_heads=8, num_layers=8, dim_feedforward=2048,
        causal=True, context=250, positional_embedding="rope",
        max_period=10_000.0, gating="none", norm="layer_norm", layer_scale=0.01))
    quantizer: RVQConfig = field(default_factory=lambda: RVQConfig(
        dimension=256, input_dimension=512, output_dimension=512, n_q=32, bins=2048))
    num_codebooks: int = 8

    @property
    def encoder_frame_rate(self) -> float:
        return self.sample_rate / self.seanet.hop_length

    @property
    def frame_size(self) -> int:
        return int(self.sample_rate / self.frame_rate)

    @property
    def downsample_stride(self) -> int:
        s = self.encoder_frame_rate / self.frame_rate
        assert s == int(s), s
        return int(s)


def mimi_v0_1_config(num_codebooks: int = 8) -> MimiConfig:
    """The released Mimi checkpoint configuration (loaders.py:38-88)."""
    return MimiConfig(num_codebooks=num_codebooks)


class MimiModel:
    def __init__(self, config: MimiConfig):
        self.config = config
        c = config
        self.encoder = SEANetEncoder(c.seanet)
        self.decoder = SEANetDecoder(c.seanet)
        dims = (c.seanet.dimension,)
        self.encoder_transformer = ProjectedTransformer(c.transformer, c.seanet.dimension, dims)
        self.decoder_transformer = ProjectedTransformer(c.transformer, c.seanet.dimension, dims)
        self.downsample = ConvDownsample1d(c.downsample_stride, c.seanet.dimension, learnt=True)
        # channel_wise=True reproduces the reference `upsample_channel_wise_bug`.
        self.upsample = ConvTrUpsample1d(c.downsample_stride, c.seanet.dimension,
                                         learnt=True, channel_wise=True)
        self.quantizer = SplitResidualVectorQuantizer(c.quantizer)
        self.quantizer.set_num_codebooks(c.num_codebooks)

    # ------------------------------------------------------------------ setup
    @property
    def frame_rate(self) -> float:
        return self.config.frame_rate

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def frame_size(self) -> int:
        return self.config.frame_size

    @property
    def num_codebooks(self) -> int:
        return self.quantizer.n_q

    @property
    def cardinality(self) -> int:
        return self.quantizer.cardinality

    def set_num_codebooks(self, n: int):
        self.quantizer.set_num_codebooks(n)

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> dict:
        keys = jax.random.split(key, 7)
        return {
            "encoder": self.encoder.init_params(keys[0], dtype),
            "decoder": self.decoder.init_params(keys[1], dtype),
            "encoder_transformer": self.encoder_transformer.init_params(keys[2], dtype),
            "decoder_transformer": self.decoder_transformer.init_params(keys[3], dtype),
            "downsample": self.downsample.init_params(keys[4], dtype),
            "upsample": self.upsample.init_params(keys[5], dtype),
            "quantizer": self.quantizer.init_params(keys[6], dtype),
        }

    def init_encode_state(self, batch_size: int, dtype=jnp.float32) -> dict:
        return {
            "encoder": self.encoder.init_state(batch_size, dtype),
            "transformer": self.encoder_transformer.init_state(batch_size, dtype),
            "downsample": self.downsample.init_state(batch_size, dtype),
        }

    def init_decode_state(self, batch_size: int, dtype=jnp.float32) -> dict:
        return {
            "decoder": self.decoder.init_state(batch_size, dtype),
            "transformer": self.decoder_transformer.init_state(batch_size, dtype),
            "upsample": self.upsample.init_state(batch_size, dtype),
        }

    # ---------------------------------------------------------------- offline
    def encode(self, params: dict, x: jax.Array) -> jax.Array:
        """x: [B, C, T] audio -> codes [B, K, T_frames] (offline, causal)."""
        fs = self.frame_size
        T = x.shape[-1]
        pad = (-T) % fs
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        emb = self.encoder.apply(params["encoder"], x.transpose(0, 2, 1))
        (emb,) = self.encoder_transformer.apply(params["encoder_transformer"], emb)
        emb = self.downsample.apply(params["downsample"], emb)
        return self.quantizer.encode(params["quantizer"], emb)

    def decode(self, params: dict, codes: jax.Array) -> jax.Array:
        """codes: [B, K, T_frames] -> audio [B, C, T_frames * frame_size]."""
        emb = self.quantizer.decode(params["quantizer"], codes)
        emb = self.upsample.apply(params["upsample"], emb)
        (emb,) = self.decoder_transformer.apply(params["decoder_transformer"], emb)
        out = self.decoder.apply(params["decoder"], emb)
        return out.transpose(0, 2, 1)

    def decode_latent(self, params: dict, codes: jax.Array) -> jax.Array:
        """Decode codes to the continuous (pre-upsample) latent [B, T, C]."""
        return self.quantizer.decode(params["quantizer"], codes)

    def encode_to_latent(self, params: dict, x: jax.Array,
                         quantize: bool = True) -> jax.Array:
        """Project audio [B, C, T] to the 12.5 Hz latent space, optionally
        skipping quantization (compression.py:390-404; used to compute TTS
        voice embeddings, scripts/tts_make_voice.py)."""
        fs = self.frame_size
        T = x.shape[-1]
        pad = (-T) % fs
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        emb = self.encoder.apply(params["encoder"], x.transpose(0, 2, 1))
        (emb,) = self.encoder_transformer.apply(params["encoder_transformer"], emb)
        emb = self.downsample.apply(params["downsample"], emb)
        if not quantize:
            return emb
        codes = self.quantizer.encode(params["quantizer"], emb)
        return self.quantizer.decode(params["quantizer"], codes)

    # --------------------------------------------------------------- streaming
    def encode_step(self, params: dict, state: dict, x: jax.Array,
                    exec_mask: jax.Array | None = None) -> tuple[jax.Array, dict]:
        """x: [B, C, n*frame_size] -> (codes [B, K, n], new state).  Pure/jittable."""
        emb, enc_state = self.encoder.step(params["encoder"], state["encoder"],
                                           x.transpose(0, 2, 1), exec_mask)
        (emb,), tr_state = self.encoder_transformer.step(
            params["encoder_transformer"], state["transformer"], emb, exec_mask)
        emb, ds_state = self.downsample.step(params["downsample"], state["downsample"],
                                             emb, exec_mask)
        codes = self.quantizer.encode(params["quantizer"], emb)
        return codes, {"encoder": enc_state, "transformer": tr_state, "downsample": ds_state}

    def decode_step(self, params: dict, state: dict, codes: jax.Array,
                    exec_mask: jax.Array | None = None) -> tuple[jax.Array, dict]:
        """codes: [B, K, n] -> (audio [B, C, n*frame_size], new state)."""
        emb = self.quantizer.decode(params["quantizer"], codes)
        emb, us_state = self.upsample.step(params["upsample"], state["upsample"],
                                           emb, exec_mask)
        (emb,), tr_state = self.decoder_transformer.step(
            params["decoder_transformer"], state["transformer"], emb, exec_mask)
        out, dec_state = self.decoder.step(params["decoder"], state["decoder"],
                                           emb, exec_mask)
        return out.transpose(0, 2, 1), {"decoder": dec_state, "transformer": tr_state,
                                        "upsample": us_state}
