"""moshi_tpu — a TPU-native (JAX/XLA/Pallas) real-time speech-text framework.

Re-implements the capabilities of kyutai-labs/moshi (Mimi streaming codec +
Moshi RQ-Transformer LM + TTS/ASR/serving) as a single JAX stack designed for
TPU: explicit pytree streaming state threaded through pure, jittable step
functions; stacked layer parameters scanned with `lax.scan`; on-device
sampling; static shapes everywhere.
"""

__version__ = "0.1.0"

SAMPLE_RATE = 24_000
FRAME_RATE = 12.5
FRAME_SIZE = int(SAMPLE_RATE / FRAME_RATE)  # 1920 samples per 80 ms frame
