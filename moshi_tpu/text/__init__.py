from .spm import SentencePieceTokenizer  # noqa: F401
