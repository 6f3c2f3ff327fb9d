"""Standalone Mimi tokenizer websocket module.

Analog of the reference moshi-server `Mimi` module and `rustymimi`'s
`StreamTokenizer` (rust/mimi-pyo3/src/lib.rs): streaming encode/decode as a
service.  Binary protocol per message:
  -> b"\\x01" + float32 PCM (multiple of frame_size)   encode request
  <- b"\\x09" + int32 codes [K * n_frames]              codes reply
  -> b"\\x09" + int32 codes [K * n_frames]              decode request
  <- b"\\x01" + float32 PCM                             audio reply
"""

import numpy as np

import jax
import jax.numpy as jnp


class MimiWsState:
    def __init__(self, mimi, mimi_params):
        self.mimi = mimi
        self.params = mimi_params
        self._encode = jax.jit(mimi.encode_step, donate_argnums=1)
        self._decode = jax.jit(mimi.decode_step, donate_argnums=1)

    def new_session(self):
        return {"enc": self.mimi.init_encode_state(1),
                "dec": self.mimi.init_decode_state(1),
                "buf": np.zeros((0,), np.float32)}

    def encode_pcm(self, sess, pcm: np.ndarray) -> np.ndarray | None:
        fs = self.mimi.frame_size
        sess["buf"] = np.concatenate([sess["buf"], pcm])
        n = sess["buf"].shape[-1] // fs
        if n == 0:
            return None
        chunk, sess["buf"] = sess["buf"][:n * fs], sess["buf"][n * fs:]
        codes, sess["enc"] = self._encode(self.params, sess["enc"],
                                          jnp.asarray(chunk)[None, None])
        return np.asarray(codes)[0]  # [K, n]

    def decode_codes(self, sess, codes: np.ndarray) -> np.ndarray:
        pcm, sess["dec"] = self._decode(self.params, sess["dec"],
                                        jnp.asarray(codes)[None])
        return np.asarray(pcm)[0, 0]


async def handle_mimi_socket(request, state: MimiWsState):
    from aiohttp import web, WSMsgType

    ws = web.WebSocketResponse()
    await ws.prepare(request)
    sess = state.new_session()
    K = state.mimi.num_codebooks
    async for message in ws:
        if message.type != WSMsgType.BINARY or not message.data:
            continue
        kind = message.data[0]
        payload = message.data[1:]
        if kind == 1:
            pcm = np.frombuffer(payload, np.float32)
            codes = state.encode_pcm(sess, pcm)
            if codes is not None:
                await ws.send_bytes(b"\x09" + codes.astype(np.int32).tobytes())
        elif kind == 9:
            flat = np.frombuffer(payload, np.int32)
            assert flat.size % K == 0, (flat.size, K)
            codes = flat.reshape(K, -1)
            pcm = state.decode_codes(sess, codes)
            await ws.send_bytes(b"\x01" + pcm.astype(np.float32).tobytes())
    return ws


class Tokenizer:
    """Offline drop-in analog of `rustymimi.Tokenizer`
    (rust/mimi-pyo3/src/lib.rs): encode/decode whole arrays plus
    `encode_step`/`decode_step` streaming."""

    def __init__(self, mimi, mimi_params):
        self.mimi = mimi
        self.params = mimi_params
        self._enc_state = None
        self._dec_state = None
        self._encode_step = jax.jit(mimi.encode_step, donate_argnums=1)
        self._decode_step = jax.jit(mimi.decode_step, donate_argnums=1)

    def encode(self, pcm: np.ndarray) -> np.ndarray:
        """pcm [B, 1, T] -> codes [B, K, n]."""
        return np.asarray(self.mimi.encode(self.params, jnp.asarray(pcm)))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        return np.asarray(self.mimi.decode(self.params, jnp.asarray(codes)))

    def encode_step(self, pcm: np.ndarray) -> np.ndarray:
        if self._enc_state is None:
            self._enc_state = self.mimi.init_encode_state(pcm.shape[0])
        codes, self._enc_state = self._encode_step(self.params, self._enc_state,
                                                   jnp.asarray(pcm))
        return np.asarray(codes)

    def decode_step(self, codes: np.ndarray) -> np.ndarray:
        if self._dec_state is None:
            self._dec_state = self.mimi.init_decode_state(codes.shape[0])
        pcm, self._dec_state = self._decode_step(self.params, self._dec_state,
                                                 jnp.asarray(codes))
        return np.asarray(pcm)

    def reset(self):
        self._enc_state = None
        self._dec_state = None
