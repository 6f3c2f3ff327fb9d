from .mimi import MimiConfig, MimiModel, mimi_v0_1_config  # noqa: F401
