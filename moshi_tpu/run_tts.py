"""Batch TTS runner: JSONL script in -> wav files out.

Behavioral reference: `moshi/moshi/run_tts.py:39-209` — reads a JSONL file
with one entry per item ({"text": ..., "voices": [...]} or {"turns": [...]}),
synthesizes a batch, writes wavs and optional debug json (transcripts with
timestamps).
"""

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from .models.loaders import CheckpointInfo
from .models.tts import TTSModel, StateMachine, TokenIds
from . import audio


DEFAULT_DSM_TTS_VOICE_REPO = "kyutai/tts-voices"  # reference tts.py:32


def build_tts(checkpoint_dir: str | Path, temp: float = 0.6,
              cfg_coef: float = 1.0, n_q: int = 32,
              max_padding: int = 8, initial_padding: int = 2,
              voice_repo: str = DEFAULT_DSM_TTS_VOICE_REPO):
    return build_tts_from_info(
        CheckpointInfo.from_dir(checkpoint_dir), temp=temp, cfg_coef=cfg_coef,
        n_q=n_q, max_padding=max_padding, initial_padding=initial_padding,
        voice_repo=voice_repo)


def build_tts_from_info(info: CheckpointInfo, temp: float = 0.6,
                        cfg_coef: float = 1.0, n_q: int = 32,
                        max_padding: int = 8, initial_padding: int = 2,
                        voice_repo: str = DEFAULT_DSM_TTS_VOICE_REPO,
                        voice_aliases: dict | None = None):
    """Info-based core of `build_tts` (worker modules built from reference
    TOMLs carry explicit file paths instead of a checkpoint dir —
    serve/toml_compat.py)."""
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi()
    from .text.spm import SentencePieceTokenizer
    tokenizer = SentencePieceTokenizer(info.tokenizer_path)

    condition_provider, fuser, cp_params = info.get_conditioners(lm.config.dim)

    tts_cfg = info.tts_config
    delay_steps = int(tts_cfg.get("audio_delay", 2.0) * mimi.frame_rate)
    machine = StateMachine(
        TokenIds(card=lm.config.text_card + 1),
        second_stream_ahead=tts_cfg.get("second_stream_ahead", 0),
        max_padding=max_padding, initial_padding=initial_padding)
    # voice names resolve to "<name>.<sig>@<epoch>.safetensors" in the voice
    # repo (reference tts.py:396-401)
    mid = info.model_id or {}
    voice_suffix = (f".{mid['sig']}@{mid['epoch']}.safetensors"
                    if "sig" in mid and "epoch" in mid else "")
    tts = TTSModel(lm, mimi, tokenizer, machine, delay_steps,
                   condition_provider=condition_provider, fuser=fuser,
                   max_speakers=tts_cfg.get("max_speakers", 5),
                   temp=temp, cfg_coef=cfg_coef, n_q=n_q,
                   voice_suffix=voice_suffix, voice_repo=voice_repo,
                   voice_aliases=voice_aliases)
    return tts, lm_params, mimi_params, cp_params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--temp", type=float, default=0.6)
    parser.add_argument("--cfg-coef", type=float, default=1.0)
    parser.add_argument("--n-q", type=int, default=32)
    parser.add_argument("--debug-json", type=str, default=None)
    parser.add_argument("--voice-repo", default=DEFAULT_DSM_TTS_VOICE_REPO)
    parser.add_argument("--text", action="append", default=None,
                        help="simple mode: text(s) to synthesize (repeatable);"
                             " broadcast against --voice like numpy")
    parser.add_argument("--voice", action="append", default=None,
                        help="simple mode: voice name(s)/path(s) (repeatable)")
    parser.add_argument("infile", nargs="?", default=None,
                        help="JSONL: one {\"turns\": [...]} per line")
    parser.add_argument("outdir")
    args = parser.parse_args()

    tts, lm_params, mimi_params, cp_params = build_tts(
        args.checkpoint_dir, args.temp, args.cfg_coef, args.n_q,
        voice_repo=args.voice_repo)

    if args.text is not None:
        # simple broadcast API (reference tts.py:693-800)
        texts = args.text if len(args.text) > 1 else args.text[0]
        voices = (args.voice if args.voice and len(args.voice) > 1
                  else (args.voice[0] if args.voice else ""))
        pcms = tts.simple_generate(lm_params, mimi_params, texts, voices,
                                   cfg_coef=args.cfg_coef,
                                   condition_params=cp_params,
                                   rng=jax.random.PRNGKey(0))
        outdir = Path(args.outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        for i, pcm in enumerate(pcms):
            path = outdir / f"tts-{i}.wav"
            audio.write_wav(path, pcm, tts.mimi.sample_rate)
            print(f"wrote {path} ({pcm.shape[-1] / tts.mimi.sample_rate:.1f}s)")
        return
    if args.infile is None:
        parser.error("either an infile or --text is required")

    entries_batch = []
    attrs = []
    for line in Path(args.infile).read_text().splitlines():
        if not line.strip():
            continue
        item = json.loads(line)
        turns = item.get("turns") or [item["text"]]
        entries_batch.append(tts.prepare_script(turns, padding_between=1))
        voices = []
        for vp in item.get("voices", []):
            from safetensors import safe_open
            with safe_open(vp, framework="numpy") as f:
                emb = f.get_tensor("speaker_wavs")
            voices.append(np.transpose(emb, (0, 2, 1)))
        attrs.append(tts.make_condition_attributes(voices, None))

    use_conditions = tts.condition_provider is not None and cp_params is not None
    result = tts.generate(lm_params, entries_batch,
                          attributes=attrs if use_conditions else None,
                          condition_params=cp_params,
                          rng=jax.random.PRNGKey(0))
    pcms = tts.synthesize_pcm(lm_params, mimi_params, result)

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for i, pcm in enumerate(pcms):
        path = outdir / f"tts-{i}.wav"
        audio.write_wav(path, pcm, tts.mimi.sample_rate)
        print(f"wrote {path} ({pcm.shape[-1] / tts.mimi.sample_rate:.1f}s)")
    if args.debug_json:
        dbg = {"transcripts": result.all_transcripts,
               "end_steps": result.end_steps,
               "consumption_times": result.all_consumption_times}
        Path(args.debug_json).write_text(json.dumps(dbg, indent=2))


if __name__ == "__main__":
    main()
