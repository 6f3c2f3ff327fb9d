// Environment-free protocol state machine for the moshi web client.
//
// Mirrors the reference client's encoder/dispatch logic
// (client/src/protocol/encoder.ts:1, useServerStream) as a pure module: no
// DOM, no WebSocket, no audio — inputs are socket events, outputs are a list
// of ACTIONS the host (index.html, or the python twin's test harness)
// executes.  moshi_tpu/client_protocol.py is a line-for-line python twin of
// this file; tests/test_client_protocol.py drives the twin against the real
// server so the logic here is covered without a browser.
//
// Action tuples (arrays; first element is the kind):
//   ["send", bytes]            write a binary frame to the socket
//   ["status", str]            human-readable status line
//   ["setup_audio"]            start capture/playback (handshake complete)
//   ["controls", bool]         enable/disable pause-resume-restart buttons
//   ["audio", bytes]           ogg-opus bytes for the decoder
//   ["pcm", bytes]             raw f32 PCM bytes for the player
//   ["text", str, colorIdx]    transcript append (colorIdx null for MT 2,
//                              0-10 palette index for MT 7)
//   ["session_info", str]      session-config echo summary
//   ["queue", position]        queued behind other sessions
//   ["resumed"]                server restored a previous session
//   ["transcript_clear"]       session restarted in-place
//   ["reconnect", resumeId, delayMs]  schedule a resume reconnect
//   ["error", str]             server error text

"use strict";

const MT = { HANDSHAKE: 0, AUDIO: 1, TEXT: 2, CONTROL: 3, METADATA: 4,
             ERROR: 5, PING: 6, COLOREDTEXT: 7, PCM: 10 };
const CTRL = { START: 0, END_TURN: 1, PAUSE: 2, RESTART: 3 };

const SESSION_PARAM_DEFAULTS = {
  text_temperature: "0.7", text_topk: "25",
  audio_temperature: "0.8", audio_topk: "250",
  pad_mult: "0", repetition_penalty: "1.0",
  repetition_penalty_context: "0", text_seed: "",
};

// ws query string from the params form (reference Conversation.tsx:58-66;
// the server echoes the effective config via MT 4).  `params` maps name ->
// string; values equal to the default (or empty) are omitted.
function sessionQuery(params, resume) {
  const parts = [];
  for (const [name, dflt] of Object.entries(SESSION_PARAM_DEFAULTS)) {
    const v = (params[name] === undefined ? "" : String(params[name])).trim();
    if (v !== "" && v !== dflt)
      parts.push(`${name}=${encodeURIComponent(v)}`);
  }
  parts.push("resume_support=1");
  if (resume) parts.push(`resume=${resume}`);
  return "?" + parts.join("&");
}

function frame(mt, body) {
  const out = new Uint8Array(1 + body.length);
  out[0] = mt;
  out.set(body, 1);
  return out;
}

class MoshiProtocol {
  // opusMode: host-probed WebCodecs support (resolved BEFORE the socket
  // opens — see index.html's ordering note); resumeId carries across
  // instances on reconnect.
  constructor(opusMode, useTone) {
    this.opusMode = opusMode;
    this.useTone = useTone;
    this.resumeId = null;
    this.resumeTries = 0;
    this.userClosed = false;
    this.audioUp = false;
  }

  onopen() {
    if (!this.opusMode)
      return [["send", frame(MT.METADATA, new TextEncoder().encode(
        JSON.stringify({ raw_pcm: true, client: "moshi_tpu-web" })))]];
    return [];
  }

  onclose() {
    const acts = [["controls", false]];
    if (!this.userClosed && this.resumeId && this.resumeTries < 3) {
      this.resumeTries++;
      const id = this.resumeId;
      this.resumeId = null;
      acts.push(["reconnect", id, 300]);
      return acts;
    }
    acts.push(["status", "disconnected"]);
    this.userClosed = false;
    return acts;
  }

  // user controls -> binary frames
  pause() { return [["send", frame(MT.CONTROL, Uint8Array.of(CTRL.PAUSE))], ["status", "paused"]]; }
  start() { return [["send", frame(MT.CONTROL, Uint8Array.of(CTRL.START))], ["status", "listening…"]]; }
  restart() { return [["send", frame(MT.CONTROL, Uint8Array.of(CTRL.RESTART))]]; }
  disconnect() { this.userClosed = true; return []; }

  _listening() {
    return (this.useTone ? "streaming test tone" : "listening…");
  }

  onmessage(data) {
    if (!data.length) return [];
    const body = data.subarray(1);
    const acts = [];
    switch (data[0]) {
      case MT.HANDSHAKE:
        if (this.opusMode) {
          this.audioUp = true;
          acts.push(["setup_audio"]);
          acts.push(["status", this._listening() + " [opus]"]);
          acts.push(["controls", true]);
        } else {
          acts.push(["status", "handshake ok — negotiating raw pcm…"]);
        }
        break;
      case MT.AUDIO:
        this.resumeTries = 0;  // producing session: refresh reconnect budget
        if (this.audioUp) acts.push(["audio", body]);
        break;
      case MT.METADATA: {
        const meta = JSON.parse(new TextDecoder().decode(body));
        if (meta.text_temperature !== undefined)  // session-config echo
          acts.push(["session_info",
                     `temp ${meta.text_temperature}/${meta.audio_temperature}` +
                     ` topk ${meta.text_topk}/${meta.audio_topk}` +
                     ` seed ${meta.seed}`]);
        if (meta.raw_pcm && !this.audioUp) {
          this.audioUp = true;
          acts.push(["setup_audio"]);
          acts.push(["status", this._listening()]);
          acts.push(["controls", true]);
        }
        if (meta.status === "wait")  // queued behind other sessions
          acts.push(["queue", meta.queue_position]);
        if (meta.resume_id) {
          this.resumeId = meta.resume_id;
          if (meta.resumed) { acts.push(["resumed"]); acts.push(["status", "session resumed"]); }
        }
        if (meta.event === "restarted") {
          acts.push(["transcript_clear"]);
          acts.push(["status", "session restarted"]);
        }
        break;
      }
      case MT.PCM:
        this.resumeTries = 0;  // producing session: refresh reconnect budget
        acts.push(["pcm", body]);
        break;
      case MT.TEXT:
        acts.push(["text", new TextDecoder().decode(body), null]);
        break;
      case MT.COLOREDTEXT:
        // 1 confidence byte (0-10 palette index) + utf-8 text
        acts.push(["text", new TextDecoder().decode(body.subarray(1)),
                   Math.min(10, body[0])]);
        break;
      case MT.ERROR:
        acts.push(["error", new TextDecoder().decode(body)]);
        break;
      case MT.PING:
        break;  // keepalive echo
      default:
        break;  // unknown message types are discarded (protocol.md:32)
    }
    return acts;
  }
}

if (typeof window !== "undefined") {
  window.MoshiProtocol = MoshiProtocol;
  window.moshiSessionQuery = sessionQuery;
  window.MT = MT;
  window.CTRL = CTRL;
}
if (typeof module !== "undefined" && module.exports)
  module.exports = { MoshiProtocol, sessionQuery, MT, CTRL,
                     SESSION_PARAM_DEFAULTS };
