"""audio_edge_ml_pipeline_tpu — a TPU-native rebuild of the
gcpgarcias/audio-edge-ml-pipeline capability surface.

The reference (see /root/reference, SURVEY.md) is a 9-stage, single-host,
Python/librosa/Keras batch pipeline: ingestion -> feature extraction ->
training -> tuning -> selection -> quantization -> compilation -> bare-C
codegen for STM32 -> device evaluation -> monitoring.

This package keeps the reference's *interfaces* (registries, FeatureSet
directory format, YAML config schemas, CLI entry points, shortlist /
optimization-report JSON contracts, generated PlatformIO C projects) and
replaces the *execution model* with a TPU-first design:

- DSP runs as batched, jit-compiled array programs (STFT-as-matmul on the
  MXU, slaney mel filterbank matmuls, fused Pallas kernels) instead of
  per-sample librosa loops (reference base.py:199-214).
- Trainers are flax/optax train steps under jit/pjit instead of Keras
  ``model.fit`` (reference models/deep.py).
- Quantization benchmarking is on-TPU fp16/bf16/int8 emulation producing the
  exact ``optimization_report.json`` schema (reference optimize.py:229-249).
- Scaling uses ``jax.sharding.Mesh`` + NamedSharding over ICI (the
  reference has no distributed layer at all; SURVEY.md §2c).

Subpackages
-----------
ops       Numeric kernels: JAX/Pallas DSP + quantization; ops.golden is the
          float64 numpy reference (librosa-compatible algorithms) used as
          the parity oracle in tests.
features  Extractor layer: FeatureSet, registries, the batched audio /
          image / text / tabular / video extractors, pipeline + augment CLIs.
data      Dataset loaders and raw audio/video/image I/O.
models    Trainer registry: flax deep models + JAX classical models.
train     train / tune / select CLIs, metrics, tracking integration.
optimize  Quantization emulation + optimize CLI + TFLite export.
parallel  Device mesh, shardings, collectives.
deploy    C codegen (PlatformIO project), arena estimator, export bundles.
serve     Ingestion HTTP API and monitoring dashboard.
utils     Config loading, run tracking (mlruns-compatible file store), log.
"""

__version__ = "0.1.0"
