from .mimi import MimiConfig, MimiModel, mimi_v0_1_config  # noqa: F401
from .lm import LmConfig, LMModel  # noqa: F401
from .lm_gen import LMGen, LMGenConfig  # noqa: F401
from .tts import TTSModel, StateMachine, TokenIds, Entry  # noqa: F401
from .asr import StreamingASR  # noqa: F401
from . import loaders  # noqa: F401
