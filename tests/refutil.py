"""Helpers to load the reference implementation (PyTorch, CPU) for
behavioral parity tests.  The reference is mounted read-only at
/root/reference; tests that use it skip when unavailable."""

import sys
import types

import numpy as np

_REF_PATH = "/root/reference/moshi"


def import_reference():
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    if "sphn" not in sys.modules:
        try:
            import sphn  # noqa: F401
        except ImportError:
            sys.modules["sphn"] = types.ModuleType("sphn")
    if "sentencepiece" not in sys.modules:
        sp = types.ModuleType("sentencepiece")

        class SentencePieceProcessor:  # minimal stub; loaders only annotates it
            pass

        sp.SentencePieceProcessor = SentencePieceProcessor
        sys.modules["sentencepiece"] = sp
    import moshi  # noqa: F401
    return moshi


def state_dict_to_numpy(module) -> dict:
    import torch
    out = {}
    for k, v in module.state_dict().items():
        if v.dtype in (torch.bfloat16, torch.float16):
            v = v.float()
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out
