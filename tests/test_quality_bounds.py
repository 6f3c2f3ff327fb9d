"""Asserted quality bounds for the quantized serving knobs (VERDICT r3
item 3): the forced-teacher divergence harness from scripts/quality_audit.py
run at short horizon, with thresholds set ~10x above the measured tiny-scale
drift (QUALITY.md) — a regression in the int8/int4 KV kernels, the q4 weight
path, or the bf16 codec shows up as a red test here long before a perf run.
A genuinely broken kernel lands at agreement ~0.3 / KL ~0.1, orders of
magnitude past these bounds."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "quality_audit",
    Path(__file__).resolve().parent.parent / "scripts" / "quality_audit.py")
qa = importlib.util.module_from_spec(_spec)
sys.modules["quality_audit"] = qa
_spec.loader.exec_module(qa)


STEPS, WINDOW = 300, 300


@pytest.fixture(scope="module")
def recordings():
    """Baseline token stream + reference/variant forced recordings on the
    tiny config (shared across the bound tests; ~6 streams of 300 steps)."""
    config, base_model, base_builder, variants = qa.build_variants("tiny")
    base_params = base_builder()
    inputs, text, audio, _ = qa.run_baseline(base_model, base_params, STEPS)
    base = (inputs, text, audio)
    ref = qa.record_stream(base_model, base_params, base, STEPS)
    recs = {}
    for name, model, builder in variants:
        recs[name] = qa.compare_streams(
            ref, qa.record_stream(model, builder(), base, STEPS), WINDOW)[0]
    return recs


def test_control_is_exact(recordings):
    """The harness floor: same model + params through the same program
    must diverge by exactly nothing."""
    r = recordings["control"]
    assert r["text_agree"] == 1.0 and r["audio_agree"] == 1.0
    assert r["text_kl_mean"] == 0.0 and r["text_logit_mae"] == 0.0


def test_int8_kv_bounds(recordings):
    r = recordings["kv_int8"]
    assert r["text_agree"] >= 0.90, r
    assert r["audio_agree"] >= 0.90, r
    assert r["text_kl_mean"] <= 5e-4, r


def test_int4_kv_bounds(recordings):
    r = recordings["kv_int4"]
    assert r["text_agree"] >= 0.85, r
    assert r["audio_agree"] >= 0.85, r
    assert r["text_kl_mean"] <= 1e-2, r


def test_int8_weight_bounds(recordings):
    r = recordings["w_int8"]
    assert r["text_agree"] >= 0.80, r
    assert r["text_kl_mean"] <= 2e-2, r


def test_q4_weight_bounds(recordings):
    """q4 at group-size 32 on dim-32 tiny weights is the extreme case
    (measured KL ~4e-2; raw agreement suffers tie-flips on random
    near-uniform logits — the margin-confident agreement stays ~1.0)."""
    r = recordings["w_q4"]
    assert r["text_agree"] >= 0.45, r
    assert r["text_kl_mean"] <= 1.5e-1, r


def test_headline_stack_bounds(recordings):
    """The batched-serving default (int8 weights + int4 KV) composes
    additively (measured KL ~6e-4 ~ int4-KV + int8-w)."""
    r = recordings["headline_int8w_int4kv"]
    assert r["text_agree"] >= 0.85, r
    assert r["text_kl_mean"] <= 1e-2, r


def test_bf16_codec_bounds():
    """bf16 Mimi vs f32: streaming code agreement and decode SNR (the
    --mimi-dtype bf16 serving knob, BENCH_BATCH.md)."""
    rows = qa.audit_mimi("tiny", frames=120, window=120)
    r = rows[0]
    assert r["code_agree"] >= 0.97, r
    assert r["decode_snr_db"] >= 30.0, r
