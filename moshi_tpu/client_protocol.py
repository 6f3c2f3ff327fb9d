"""Python twin of `client/protocol.js` — the web client's protocol state
machine, mirrored line-for-line so the JS (which cannot execute in this
environment: no browser/node) is covered by integration tests against the
real server (tests/test_client_protocol.py), the way `ogg.py` twins
`ogg.js` for the ogg-opus byte framing.

Behavioral reference: the reference web client's dispatch
(client/src/protocol/encoder.ts:1, useServerStream) over the binary ws
protocol (rust/protocol.md:1-31): MT 0 handshake / 1 audio / 2 text /
3 control / 4 metadata / 5 error / 6 ping / 7 coloredtext, plus this
stack's raw-PCM extension (MT 10) and one-shot session resume.

Inputs are socket events; outputs are ACTION tuples the host executes —
see protocol.js's header comment for the full list.  Keep the two files in
sync: every `case` branch here must match the JS switch verbatim.
"""

import json
import urllib.parse

MT = {"HANDSHAKE": 0, "AUDIO": 1, "TEXT": 2, "CONTROL": 3, "METADATA": 4,
      "ERROR": 5, "PING": 6, "COLOREDTEXT": 7, "PCM": 10}
CTRL = {"START": 0, "END_TURN": 1, "PAUSE": 2, "RESTART": 3}

SESSION_PARAM_DEFAULTS = {
    "text_temperature": "0.7", "text_topk": "25",
    "audio_temperature": "0.8", "audio_topk": "250",
    "pad_mult": "0", "repetition_penalty": "1.0",
    "repetition_penalty_context": "0", "text_seed": "",
}


def session_query(params: dict, resume: str | None = None) -> str:
    """ws query string from the params form (reference Conversation.tsx:58-66;
    the server echoes the effective config via MT 4).  Values equal to the
    default (or empty) are omitted."""
    parts = []
    for name, dflt in SESSION_PARAM_DEFAULTS.items():
        v = str(params.get(name, "")).strip()
        if v != "" and v != dflt:
            parts.append(f"{name}={urllib.parse.quote(v)}")
    parts.append("resume_support=1")
    if resume:
        parts.append(f"resume={resume}")
    return "?" + "&".join(parts)


def frame(mt: int, body: bytes) -> bytes:
    return bytes([mt]) + body


class MoshiProtocol:
    """opusMode: host-probed WebCodecs support (resolved BEFORE the socket
    opens); resumeId carries across instances on reconnect."""

    def __init__(self, opus_mode: bool, use_tone: bool = False):
        self.opus_mode = opus_mode
        self.use_tone = use_tone
        self.resume_id: str | None = None
        self.resume_tries = 0
        self.user_closed = False
        self.audio_up = False

    def onopen(self) -> list:
        if not self.opus_mode:
            return [("send", frame(MT["METADATA"], json.dumps(
                {"raw_pcm": True, "client": "moshi_tpu-web"}).encode()))]
        return []

    def onclose(self) -> list:
        acts: list = [("controls", False)]
        if not self.user_closed and self.resume_id and self.resume_tries < 3:
            self.resume_tries += 1
            rid = self.resume_id
            self.resume_id = None
            acts.append(("reconnect", rid, 300))
            return acts
        acts.append(("status", "disconnected"))
        self.user_closed = False
        return acts

    # user controls -> binary frames
    def pause(self) -> list:
        return [("send", frame(MT["CONTROL"], bytes([CTRL["PAUSE"]]))),
                ("status", "paused")]

    def start(self) -> list:
        return [("send", frame(MT["CONTROL"], bytes([CTRL["START"]]))),
                ("status", "listening…")]

    def restart(self) -> list:
        return [("send", frame(MT["CONTROL"], bytes([CTRL["RESTART"]])))]

    def disconnect(self) -> list:
        self.user_closed = True
        return []

    def _listening(self) -> str:
        return "streaming test tone" if self.use_tone else "listening…"

    def onmessage(self, data: bytes) -> list:
        if not len(data):
            return []
        body = data[1:]
        acts: list = []
        mt = data[0]
        if mt == MT["HANDSHAKE"]:
            if self.opus_mode:
                self.audio_up = True
                acts.append(("setup_audio",))
                acts.append(("status", self._listening() + " [opus]"))
                acts.append(("controls", True))
            else:
                acts.append(("status", "handshake ok — negotiating raw pcm…"))
        elif mt == MT["AUDIO"]:
            self.resume_tries = 0  # producing session: refresh reconnect budget
            if self.audio_up:
                acts.append(("audio", body))
        elif mt == MT["METADATA"]:
            meta = json.loads(body.decode())
            if "text_temperature" in meta:  # session-config echo
                acts.append(("session_info",
                             f"temp {meta['text_temperature']}/"
                             f"{meta['audio_temperature']}"
                             f" topk {meta['text_topk']}/{meta['audio_topk']}"
                             f" seed {meta['seed']}"))
            if meta.get("raw_pcm") and not self.audio_up:
                self.audio_up = True
                acts.append(("setup_audio",))
                acts.append(("status", self._listening()))
                acts.append(("controls", True))
            if meta.get("status") == "wait":  # queued behind other sessions
                acts.append(("queue", meta["queue_position"]))
            if meta.get("resume_id"):
                self.resume_id = meta["resume_id"]
                if meta.get("resumed"):
                    acts.append(("resumed",))
                    acts.append(("status", "session resumed"))
            if meta.get("event") == "restarted":
                acts.append(("transcript_clear",))
                acts.append(("status", "session restarted"))
        elif mt == MT["PCM"]:
            self.resume_tries = 0  # producing session: refresh reconnect budget
            acts.append(("pcm", body))
        elif mt == MT["TEXT"]:
            acts.append(("text", body.decode(), None))
        elif mt == MT["COLOREDTEXT"]:
            # 1 confidence byte (0-10 palette index) + utf-8 text
            acts.append(("text", body[1:].decode(), min(10, body[0])))
        elif mt == MT["ERROR"]:
            acts.append(("error", body.decode()))
        elif mt == MT["PING"]:
            pass  # keepalive echo
        # unknown message types are discarded (protocol.md:32)
        return acts
