"""Stage 6 — quantization / optimization benchmarking.

The reference benchmarks ONNX dynamic/static INT8 + fp16 via onnxruntime
(reference optimize.py, quantize.py). Neither onnx nor onnxruntime exists in
this environment; instead quantization is **emulated on the accelerator**
(fake-quant weights/activations, real quantized artifacts on disk, real
accuracy/latency measurements) producing the identical
optimization_report.json schema, per SURVEY.md §7 step 6. Real TFLite export
lives in the compilation stage (jax2tf is available).
"""
