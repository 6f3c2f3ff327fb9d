"""Streaming TTS websocket module: words in -> audio out, incrementally.

Behavioral reference: `rust/moshi-core/src/tts_streaming.rs` (text/audio
delay, pause when the word queue starves — max_consecutive_pads, 28-45) and
the moshi-server `Tts` module.  Client protocol (JSON text frames in, binary
out):
  -> {"type": "Text", "text": "word"}     queue one word
  -> {"type": "Eos"}                      end of input
  <- b"\\x01" + ogg-opus audio
  <- {"type": "Text", "text": ..., "start_s": ...}  word timing events
  <- {"type": "Eos"}                      generation finished
"""

import argparse
import asyncio
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lm_gen import LMGen, LMGenConfig
from ..models.tts import Entry, StateMachine, TokenIds
from ..models.lm import UNGENERATED_TOKEN, ZERO_TOKEN


OPUS_RATES = (8000, 12000, 16000, 24000, 48000)


def make_audio_encoder(sample_rate: int):
    """Streaming ogg-opus encoder for the outbound b"\\x01" audio frames;
    falls back to raw f32le when the sample rate is outside what opus
    supports (tiny test configs)."""
    if sample_rate in OPUS_RATES:
        from .. import moshi_native
        return moshi_native.OpusStreamWriter(sample_rate)

    class _Raw:
        def append_pcm(self, pcm):
            return np.ascontiguousarray(pcm, np.float32).tobytes()

    return _Raw()


class TTSStreamer:
    """Incremental DSM TTS over one session: words can be fed while audio is
    being generated; generation pauses when the word queue starves."""

    def __init__(self, tts, lm_params, mimi_params, rng,
                 max_consecutive_starved_pads: int = 10,
                 condition_params: dict | None = None):
        self.tts = tts
        self.lm_params = lm_params
        self.mimi_params = mimi_params
        self.cp_params = condition_params
        self.condition_sum = None
        lm = tts.lm
        self.gen = LMGen(lm, LMGenConfig(
            use_sampling=True, temp=tts.temp, temp_text=tts.temp,
            cfg_coef=tts.cfg_coef, padding_bonus=tts.padding_bonus))
        self.machine = tts.machine
        self.state = self.machine.new_state([])
        self.gstate = self.gen.init_state(1, rng)
        self.dec_state = tts.mimi.init_decode_state(1)
        self.offset = 0
        self.eos = False
        self.max_starved = max_consecutive_starved_pads
        c = lm.config
        self._missing = c.num_codebooks - c.dep_q - 1
        self._input = jnp.full((1, max(self._missing, 1), 1), ZERO_TOKEN, jnp.int32)
        self._no_dep = jnp.full((1, c.dep_q, 1), ZERO_TOKEN, jnp.int32)
        self._gen_delays = np.asarray(c.delays[c.audio_offset:c.audio_offset + c.dep_q])
        self._main = jax.jit(self.gen.main_step, donate_argnums=1)

        # Fused depformer + mimi-decode: one device round-trip per frame
        # instead of two (the host only intervenes between the temporal step
        # and the depformer, where the DSM text machine rewrites the token).
        # Invalid (pre-delay) frames freeze the decoder state via exec mask.
        def depth_decode(lm_params, mimi_params, gstate, dec_state,
                         text_token, h, replace, zero_mask, valid):
            out, gstate = self.gen.depth_step(lm_params, gstate, text_token,
                                              h, None, replace, zero_mask,
                                              None)
            codes = jnp.clip(out[:, 1:tts.n_q + 1], 0, None)
            pcm, dec_state = tts.mimi.decode_step(mimi_params, dec_state,
                                                  codes, exec_mask=valid)
            return out, pcm, gstate, dec_state

        self._depth_decode = jax.jit(depth_decode, donate_argnums=(2, 3))

    def set_voice(self, voice_embedding: np.ndarray):
        """Per-session speaker conditioning: cross-attn K/V from a speaker
        embedding [T, D] (reference tts_streaming voice queries; the wire
        shape matches py_module InMsg::Voice{embeddings, shape}).  Requires
        a conditioned checkpoint (cross-attn LM + speaker_wavs conditioner);
        silently ignored otherwise."""
        tts = self.tts
        if tts.condition_provider is None or self.cp_params is None:
            return
        attrs = [tts.make_condition_attributes(
            [np.asarray(voice_embedding, np.float32)[None]], None)]
        if self.gen.model_batch_mult == 2:
            from ..conditioners import dropout_all_conditions
            attrs = attrs + dropout_all_conditions(attrs)
        tensors = tts.condition_provider.prepare_and_provide(
            self.cp_params, attrs)
        if tts.fuser is None:
            return
        self.condition_sum = tts.fuser.get_sum(tensors)
        cross = tts.fuser.get_cross(tensors)
        if cross is not None:
            self.gstate = self.gen.init_cross_state(self.gstate,
                                                    self.lm_params, cross)

    def feed_words(self, words: list[str]):
        """Queue text: normalized per rust tts_preprocess.rs (apostrophes,
        dashes, colons, parens), with SSML `<break time="Ns"/>` turned into
        padding entries."""
        from ..text.tts_preprocess import (parse_segments, normalize,
                                           BreakTime, MAX_BREAK_S)
        for w in words:
            for seg in parse_segments(w):
                if isinstance(seg, BreakTime):
                    if seg.seconds > 0:
                        npad = max(int(min(seg.seconds, MAX_BREAK_S)
                                       * self.tts.mimi.frame_rate), 1)
                        self.state.entries.append(
                            Entry(tokens=[], text="", padding=npad))
                    continue
                for word in normalize(seg).split():
                    tokens = list(self.tts.tokenizer.encode(word))
                    self.state.entries.append(Entry(tokens=tokens, text=word))

    def feed_eos(self):
        self.eos = True

    @property
    def starved(self) -> bool:
        """True when the machine would have to pad only because no words are
        queued yet (and the client hasn't sent EOS)."""
        return (not self.eos and not self.state.entries
                and not self.state.queued and self.state.forced_padding <= 0)

    @property
    def finished(self) -> bool:
        return (self.state.end_step is not None
                and self.offset >= self.state.end_step + self.tts.delay_steps
                + self.tts.final_padding)

    def step(self):
        """One generation frame.  Returns (pcm [T] | None, events)."""
        tts = self.tts
        c = tts.lm.config
        text_token, _, h, self.gstate = self._main(
            self.lm_params, self.gstate, self._input, None,
            self.condition_sum)
        tok = int(np.asarray(text_token)[0])
        before = len(self.state.transcript)
        out_tok, _ = self.machine.process(self.offset, self.state, tok)
        events = [{"type": "Text", "text": w,
                   "start_s": s / tts.mimi.frame_rate}
                  for w, s in self.state.transcript[before:]]
        if not self.eos and self.state.end_step is not None:
            # ran out of words but the client may send more: back out the end
            self.state.end_step = None

        zero_mask = jnp.asarray(self.offset < self._gen_delays + tts.delay_steps)
        replace = self._no_dep if self.offset < tts.delay_steps else None
        # valid once past both the acoustic max delay and the text-audio delay
        valid = self.offset + 1 > max(self.gen.max_delay, tts.delay_steps)
        out, pcm, self.gstate, self.dec_state = self._depth_decode(
            self.lm_params, self.mimi_params, self.gstate, self.dec_state,
            jnp.asarray(np.asarray([out_tok], np.int32)), h, replace,
            zero_mask, jnp.asarray([valid]))
        self.offset += 1
        if not valid:
            return None, events
        out_np = np.asarray(out)
        if (out_np == UNGENERATED_TOKEN).any():
            return None, events
        return np.clip(np.asarray(pcm)[0, 0], -1, 1), events


async def handle_tts_socket(request, make_streamer):
    from aiohttp import web, WSMsgType

    ws = web.WebSocketResponse()
    await ws.prepare(request)
    streamer = make_streamer()
    writer = make_audio_encoder(streamer.tts.mimi.sample_rate)
    await ws.send_str(json.dumps({"type": "Ready"}))

    recv_done = asyncio.Event()

    async def receiver():
        # recv_done MUST be set on every exit (including a crash): the
        # generation loop below treats "receiver finished while starved" as
        # EOS — without it a malformed message would leave the session
        # spinning forever after the client disconnects.
        try:
            async for message in ws:
                if message.type != WSMsgType.TEXT:
                    continue
                try:
                    msg = json.loads(message.data)
                    mtype = msg.get("type")
                    if mtype == "Text":
                        streamer.feed_words([str(msg["text"])])
                    elif mtype == "Voice":
                        emb = np.asarray(msg["embeddings"],
                                         np.float32).reshape(msg["shape"])
                        streamer.set_voice(emb)
                    elif mtype == "Eos":
                        streamer.feed_eos()
                except Exception as e:
                    # one bad message must not kill the session
                    await ws.send_str(json.dumps(
                        {"type": "Error", "message": f"bad message: {e}"}))
        finally:
            recv_done.set()

    recv_task = asyncio.create_task(receiver())
    try:
        while not streamer.finished:
            # receiver done == the socket is closed (async-for only ends on
            # close): no more words will ever arrive and nobody is listening
            # — wrap the generation up instead of spinning forever
            if recv_done.is_set() and not streamer.eos:
                streamer.feed_eos()
            if streamer.starved:
                await asyncio.sleep(0.01)
                continue
            pcm, events = streamer.step()
            for e in events:
                await ws.send_str(json.dumps(e))
            if pcm is not None:
                data = writer.append_pcm(np.ascontiguousarray(pcm, np.float32))
                if data:
                    await ws.send_bytes(b"\x01" + data)
            await asyncio.sleep(0)
        await ws.send_str(json.dumps({"type": "Eos"}))
    finally:
        recv_task.cancel()
        await ws.close()
    return ws


def main():
    from aiohttp import web
    from ..run_tts import build_tts

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8990)
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--temp", type=float, default=0.6)
    args = parser.parse_args()

    tts, lm_params, mimi_params, _ = build_tts(args.checkpoint_dir, args.temp)

    def make_streamer():
        return TTSStreamer(tts, lm_params, mimi_params, jax.random.PRNGKey(0))

    app = web.Application()
    app.router.add_get("/api/tts_streaming",
                       lambda req: handle_tts_socket(req, make_streamer))
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
