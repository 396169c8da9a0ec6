"""Stage 7a/7b — compilation.

- to_tflite: real TFLite export of flax bundles through jax2tf (fp32,
  dynamic-range int8, full-integer int8 with representative dataset + int8
  I/O, fp16), per-mode accuracy eval, best-within-drop selection, and the
  deploy/{model.tflite, label_names.json, mel_params.json} +
  compilation_report.json layout (contract of reference to_tflite.py:8-50).
- compile_xla: AOT-compiles the jitted forward with XLA and benchmarks it
  against the TFLite interpreter — the role of the reference's TVM
  compile-and-benchmark stage (compile_tvm.py:1-50; TVM is not available in
  this environment, XLA is the native compiler here).
"""
