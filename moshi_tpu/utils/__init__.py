from .trees import masked_reset, expand_mask  # noqa: F401
