"""Offline batched inference runner (full-duplex / hibiki / STT).

Behavioral reference: `moshi/moshi/run_inference.py` —
- STT left/right padding from `stt_config` (121-127);
- hibiki end-of-stream injection: one frame of all-`cardinality` codes after
  the input file ends, then silence until the text EOS is sampled (143-160);
- first-frame double step so the first real codes are seen instead of the
  initial tokens (164-170);
- ms/step reporting (203-207).

Usage: python -m moshi_tpu.run_inference --checkpoint-dir DIR in.wav out.wav
"""

import argparse
import time
from collections import deque
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .models.loaders import CheckpointInfo
from .models.lm_gen import LMGen, LMGenConfig
from .models.lm import UNGENERATED_TOKEN
from .conditioners import ConditionAttributes
from . import audio


def get_condition_attributes(model_type: str, batch_size: int, cfg_coef: float):
    """Hibiki 'very_good'/'very_bad' CFG conditioning (run_inference.py:34-57)."""
    if model_type != "hibiki":
        return None
    conditions = [ConditionAttributes(text={"description": "very_good"})
                  for _ in range(batch_size)]
    if cfg_coef != 1.0:
        conditions += [ConditionAttributes(text={"description": "very_bad"})
                       for _ in range(batch_size)]
    return conditions


class InferenceState:
    def __init__(self, checkpoint_info: CheckpointInfo, mimi, mimi_params,
                 lm, lm_params, text_tokenizer, batch_size: int,
                 cfg_coef: float = 1.0, condition_provider=None,
                 condition_provider_params=None, fuser=None,
                 rng=None, **lm_gen_kwargs):
        self.info = checkpoint_info
        self.model_type = checkpoint_info.model_type
        self.mimi, self.mimi_params = mimi, mimi_params
        self.lm, self.lm_params = lm, lm_params
        self.text_tokenizer = text_tokenizer
        self.batch_size = batch_size
        self.frame_size = mimi.frame_size
        gen_cfg = LMGenConfig.from_dict({**lm_gen_kwargs, "cfg_coef": cfg_coef})
        self.lm_gen = LMGen(lm, gen_cfg)
        self.condition_sum = None
        attrs = get_condition_attributes(self.model_type, batch_size, cfg_coef)
        if attrs is not None and condition_provider is not None and fuser is not None:
            tensors = condition_provider.prepare_and_provide(
                condition_provider_params, attrs)
            self.condition_sum = fuser.get_sum(tensors)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        # donate the streaming-state arg: XLA then scatters the ring KV
        # in place instead of copying it every frame (~4 ms on 7B ctx 3000)
        self._encode = jax.jit(self.mimi.encode_step, donate_argnums=1)
        self._decode = jax.jit(self.mimi.decode_step, donate_argnums=1)
        self._lm_step = jax.jit(self.lm_gen.step, donate_argnums=1)

    def run(self, in_pcms: np.ndarray, eos_id: int = 2,
            on_text=None, gen_seconds: float = 0.0, max_steps: int = 0
            ) -> list[tuple[np.ndarray, np.ndarray]]:
        """in_pcms: [B, 1, T] float32.  Returns per item (text_tokens, pcm).

        gen_seconds > 0 keeps generating past the end of the input by feeding
        silence frames for that long — the offline `gen` mode of the rust
        moshi-cli (gen.rs:20-30 pads the input with trailing zeros for the
        model to respond into).

        max_steps > 0 bounds the total step count — a safety cap for hibiki
        mode, whose loop otherwise runs until the text EOS is sampled
        (reference run_inference.py:143-160 has the same unbounded loop)."""
        B = self.batch_size
        mimi = self.mimi
        if self.model_type == "stt":
            stt = self.info.stt_config
            pad_left = int(stt.get("audio_silence_prefix_seconds", 0.0) * 24000)
            pad_right = int((stt.get("audio_delay_seconds", 0.0) + 1.0) * 24000)
            in_pcms = np.pad(in_pcms, ((0, 0), (0, 0), (pad_left, pad_right)))

        if gen_seconds > 0:
            pad = int(gen_seconds * mimi.sample_rate)
            in_pcms = np.pad(in_pcms, ((0, 0), (0, 0), (0, pad)))
        fs = self.frame_size
        nchunks = in_pcms.shape[-1] // fs
        chunks = deque(in_pcms[:, :, i * fs:(i + 1) * fs] for i in range(nchunks))

        enc_state = mimi.init_encode_state(B)
        dec_state = mimi.init_decode_state(B)
        gen_state = self.lm_gen.init_state(B, self.rng)

        out_pcms = [[] for _ in range(B)]
        out_text = [[] for _ in range(B)]
        eos_reached = [False] * B
        need_eos_input = True
        first_frame = True
        ntokens = 0
        nsteps = 0
        t0 = time.time()

        while not all(eos_reached):
            nsteps += 1
            if max_steps and nsteps > max_steps:
                break
            if chunks:
                chunk = chunks.popleft()
                codes, enc_state = self._encode(self.mimi_params, enc_state,
                                                jnp.asarray(chunk))
            elif self.model_type == "hibiki":
                if need_eos_input:
                    need_eos_input = False
                    codes = jnp.full((B, mimi.num_codebooks, 1),
                                     mimi.cardinality, jnp.int32)
                else:
                    silence = jnp.zeros((B, 1, fs), jnp.float32)
                    codes, enc_state = self._encode(self.mimi_params, enc_state,
                                                    silence)
            else:
                break

            if first_frame:
                # double-step so the first real codes are attended to
                out, gen_state = self._lm_step(self.lm_params, gen_state, codes,
                                               None, self.condition_sum)
                first_frame = False
            out, gen_state = self._lm_step(self.lm_params, gen_state, codes,
                                           None, self.condition_sum)
            out_np = np.asarray(out)
            if (out_np == UNGENERATED_TOKEN).any():
                continue
            ntokens += 1
            if self.lm.config.dep_q > 0:
                pcm, dec_state = self._decode(self.mimi_params, dec_state,
                                              jnp.clip(out[:, 1:], 0, None))
                pcm = np.asarray(pcm)
                for b in range(B):
                    if eos_reached[b]:
                        continue
                    t = int(out_np[b, 0, 0])
                    if t == eos_id and self.model_type == "hibiki":
                        if not need_eos_input:
                            eos_reached[b] = True
                    out_text[b].append(t)
                    out_pcms[b].append(pcm[b])
                    if b == 0 and on_text is not None and t not in (0, 3):
                        on_text(t)
            else:
                eos_reached = [not chunks] * B  # STT: run until input is consumed
                t = int(out_np[0, 0, 0])
                out_text[0].append(t)
                if on_text is not None and t not in (0, 3):
                    on_text(t)

        dt = time.time() - t0
        ms = 1000 * dt / max(ntokens, 1)
        print(f"processed {ntokens} steps in {dt:.0f}s, {ms:.2f}ms/step")
        if self.lm.config.dep_q > 0:
            return [(np.asarray(t), np.concatenate(p, axis=-1) if p else
                     np.zeros((1, 0), np.float32))
                    for t, p in zip(out_text, out_pcms)]
        return [(np.asarray(out_text[0]), np.zeros((1, 0), np.float32))]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True,
                        help="Directory with config.json + safetensors weights.")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--cfg-coef", type=float, default=1.0)
    parser.add_argument("--gen-seconds", type=float, default=0.0,
                        help="keep generating this long past the input "
                             "(offline moshi-cli `gen` mode)")
    parser.add_argument("--max-steps", type=int, default=0,
                        help="safety cap on total LM steps (0 = unlimited); "
                             "hibiki mode otherwise runs until text EOS")
    parser.add_argument("infile")
    parser.add_argument("outfile", nargs="?", default="")
    args = parser.parse_args()

    info = CheckpointInfo.from_dir(args.checkpoint_dir)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi()
    from .text.spm import SentencePieceTokenizer
    tok = SentencePieceTokenizer(Path(args.checkpoint_dir) / info.tokenizer_name)

    pcm, _ = audio.read_wav(args.infile, sample_rate=mimi.sample_rate)
    in_pcms = np.broadcast_to(pcm[None, :1], (args.batch_size, 1, pcm.shape[-1]))

    # --cfg-coef overrides a cfg_coef stored in the checkpoint's lm_gen_config
    gen_cfg = dict(info.lm_gen_config)
    ckpt_cfg_coef = gen_cfg.pop("cfg_coef", 1.0)
    cfg_coef = args.cfg_coef if args.cfg_coef != 1.0 else ckpt_cfg_coef
    # hibiki checkpoints carry a "description" LUT conditioner whose
    # very_good/very_bad values drive CFG (reference run_inference.py:34-57)
    provider, fuser, cp_params = info.get_conditioners(lm.config.dim)
    state = InferenceState(info, mimi, mimi_params, lm, lm_params, tok,
                           args.batch_size, cfg_coef,
                           condition_provider=provider,
                           condition_provider_params=cp_params, fuser=fuser,
                           **gen_cfg)

    def on_text(t):
        print(tok.id_to_piece(t).replace("▁", " "), end="", flush=True)

    outs = state.run(np.ascontiguousarray(in_pcms), on_text=on_text,
                     gen_seconds=args.gen_seconds, max_steps=args.max_steps)
    print()
    if args.outfile:
        out_path = Path(args.outfile)
        for i, (_, pcm_out) in enumerate(outs):
            p = out_path if len(outs) == 1 else out_path.with_name(
                f"{out_path.stem}-{i}{out_path.suffix}")
            audio.write_wav(p, pcm_out[0], mimi.sample_rate)
            print(f"wrote {p} ({pcm_out.shape[-1] / mimi.sample_rate:.1f}s)")


if __name__ == "__main__":
    main()
