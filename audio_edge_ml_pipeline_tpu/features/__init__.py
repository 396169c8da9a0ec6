"""Feature extraction layer: containers, registries, extractors, pipeline.

Public surface mirrors the reference package
src/preprocessing/feature_extraction (base.py, registry.py) while the audio
extractors run as batched jit programs on the accelerator.
"""

from .base import BaseDatasetLoader, BaseFeatureExtractor, BatchedAudioExtractor, FeatureSet  # noqa: F401
from .registry import get, list_extractors, register  # noqa: F401

# Importing concrete modules triggers registration (same pattern as the
# reference's feature_extraction/__init__.py).
from . import audio as _audio  # noqa: E402,F401
from . import image as _image  # noqa: E402,F401
from . import text as _text  # noqa: E402,F401
from . import tabular as _tabular  # noqa: E402,F401
from . import video as _video  # noqa: E402,F401
