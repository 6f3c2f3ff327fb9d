"""HF-hub checkpoint resolution (reference loaders.py:122-280): hf_get URI
forms + from_hf_repo with a local directory masquerading as the hub cache."""

import json
from pathlib import Path

import pytest

from test_server import tiny_checkpoint  # noqa: F401 (fixture)


def test_hf_get_local_forms(tmp_path):
    from moshi_tpu.models.loaders import hf_get

    f = tmp_path / "weights.safetensors"
    f.write_bytes(b"x")
    # Path passthrough
    assert hf_get(f) == f
    # file:// force-local
    assert hf_get(f"file://{f}") == f
    # plain string without a repo -> local path
    assert hf_get(str(f)) == f
    # check_local_file_exists short-circuits the hub
    assert hf_get(str(f), hf_repo="kyutai/nope",
                  check_local_file_exists=True) == f


def test_from_hf_repo_with_cache_masquerade(tiny_checkpoint, monkeypatch):
    """Patch hf_hub_download to serve files from a local checkpoint dir (the
    cache-hit case); the full model must load through from_hf_repo."""
    import moshi_tpu.models.loaders as loaders

    calls = []

    def fake_download(repo, filename, revision=None):
        calls.append((repo, filename, revision))
        p = Path(tiny_checkpoint) / filename
        if not p.exists():
            raise FileNotFoundError(filename)
        return str(p)

    # the reference resolves the tokenizer unconditionally; give it one
    (Path(tiny_checkpoint) / "tokenizer_spm_32k_3.model").write_bytes(b"")

    monkeypatch.setattr(loaders, "_hf_hub_download", fake_download)
    info = loaders.CheckpointInfo.from_hf_repo("kyutai/tiny-test",
                                               revision="main")
    assert ("kyutai/tiny-test", "config.json", "main") in calls
    assert info.root is None
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi()
    assert mimi.frame_size == 1920 and lm.config.dim == 32
    # hf:// override pulls from another repo
    info2 = loaders.CheckpointInfo.from_hf_repo(
        "kyutai/tiny-test",
        moshi_weights="hf://other/repo/model.safetensors")
    assert ("other/repo", "model.safetensors", None) in calls
    lm2, _ = info2.get_moshi()
    assert lm2.config.dim == 32


def test_from_hf_repo_legacy_no_config(tiny_checkpoint, monkeypatch):
    """Repos without config.json fall back to the Moshi-7B-era defaults
    with a warning (reference loaders.py:199-206)."""
    import moshi_tpu.models.loaders as loaders

    def fake_download(repo, filename, revision=None):
        if filename == "config.json":
            raise FileNotFoundError(filename)
        return str(Path(tiny_checkpoint) / "model.safetensors")

    monkeypatch.setattr(loaders, "_hf_hub_download", fake_download)
    with pytest.warns(UserWarning, match="no config.json"):
        info = loaders.CheckpointInfo.from_hf_repo("kyutai/legacy")
    assert info.lm_config is None  # defaults to the 7B config
    assert info.moshi_name == "model.safetensors"


def test_worker_toml_hf_repo(tiny_checkpoint, monkeypatch, tmp_path):
    """Worker TOML module with hf_repo instead of checkpoint_dir."""
    import moshi_tpu.models.loaders as loaders
    from moshi_tpu.serve.worker import build_module

    def fake_download(repo, filename, revision=None):
        p = Path(tiny_checkpoint) / filename
        if not p.exists():
            raise FileNotFoundError(filename)
        return str(p)

    (Path(tiny_checkpoint) / "tokenizer_spm_32k_3.model").write_bytes(b"")
    monkeypatch.setattr(loaders, "_hf_hub_download", fake_download)
    route, handler, startup, meta = build_module(
        "chat", {"type": "mimi", "route": "/api/mimi",
                 "hf_repo": "kyutai/tiny-test"}, seed=0)
    assert route == "/api/mimi" and callable(handler)

    with pytest.raises(ValueError, match="checkpoint_dir or hf_repo"):
        build_module("bad", {"type": "mimi", "route": "/x"}, seed=0)
