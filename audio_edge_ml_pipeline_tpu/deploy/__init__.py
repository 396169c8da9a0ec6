"""Stage 7 — deployment codegen.

Generates self-contained PlatformIO C projects (C99 kernel library, mel
frontend with librosa-contract parity, weights-in-flash, ping-pong arena
forward pass, PDM/I2S capture, serial eval protocol) from the framework's
.npz model bundles — the capability of reference model_to_c.py / onnx_to_c.py
with one generator for all bundle architectures. A host harness target lets
CI compile the generated C with g++ and check bit-parity against the JAX
pipeline, replacing the reference's device-only parity loop (SURVEY.md §4).
"""

from .arena import ArenaEstimator, estimate_arena  # noqa: F401
from .codegen import ModelToC  # noqa: F401
