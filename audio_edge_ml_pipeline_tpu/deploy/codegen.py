"""ModelToC: generate a self-contained PlatformIO C project from an .npz
model bundle (mlp / cnn / distillation_cnn architectures).

Capability contract of reference model_to_c.py:971-1330: weights-in-flash,
ping-pong single-arena forward pass, mel frontend bit-matched to the host
extractor, PDM/I2S capture with DC removal + 4 kHz notch, top-3 serial
output, FEAT_DUMP / PCM_DUMP / EVAL compile-time modes, per-board
platformio.ini + custom linker script. Additionally emits a host harness
(host_main.c) so CI can compile the project with gcc and verify numerical
parity against the JAX pipeline (replacing the reference's device-only
parity loop, SURVEY.md §4).
"""

from __future__ import annotations

import json
import logging
import math
from pathlib import Path
from typing import Optional

import numpy as np

from ..models.deep import load_model_bundle
from ..ops.golden import librosa_ref as golden
from . import ckernels
from .arena import ArenaEstimator, LayerCost

logger = logging.getLogger(__name__)

BOARDS = {
    "nicla_vision": {
        "platform": "ststm32",
        "board": "nicla_vision",
        "framework": "arduino",
        "audio": "pdm",
        "extra": "board_build.ldscript = nicla_vision.ld",
    },
    "xiao_nrf52840": {
        "platform": "nordicnrf52",
        "board": "xiaoblesense",
        "framework": "arduino",
        "audio": "pdm",
        "extra": "",
    },
    "esp32s3": {
        "platform": "espressif32",
        "board": "esp32-s3-devkitc-1",
        "framework": "arduino",
        "audio": "i2s",
        "extra": "",
    },
    "generic": {
        "platform": "native",
        "board": "",
        "framework": "",
        "audio": "stub",
        "extra": "",
    },
}


def _c_float(v: float) -> str:
    s = f"{v:.9g}"
    if "." not in s and "e" not in s and "n" not in s:  # 0 -> 0.0 (valid f literal)
        s += ".0"
    return s + "f"


def _c_float_array(name: str, arr: np.ndarray, per_line: int = 8) -> str:
    flat = np.asarray(arr, dtype=np.float32).ravel()
    vals = [_c_float(v) for v in flat]
    lines = [", ".join(vals[i : i + per_line]) for i in range(0, len(vals), per_line)]
    body = ",\n    ".join(lines)
    return f"const float {name}[{len(flat)}] = {{\n    {body}\n}};\n"


class ModelToC:
    """Generate C sources for one bundle.

    Parameters mirror the reference deploy CLI: labels, feature/frontend
    params (sample_rate, n_mels, n_fft, hop_length, duration), board,
    max_ram_kb budget.
    """

    def __init__(
        self,
        bundle_path: Path | str,
        labels: list[str],
        sample_rate: int = 16000,
        n_mels: int = 40,
        n_fft: int = 512,
        hop_length: int = 160,
        duration: float = 5.0,
        board: str = "nicla_vision",
        max_ram_kb: Optional[float] = 180.0,
    ) -> None:
        self.bundle_path = Path(bundle_path)
        self.arch, self.flat, self.norm_mean, self.norm_var = load_model_bundle(self.bundle_path)
        self.labels = list(labels)
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.duration = duration
        self.n_samples = int(duration * sample_rate)
        self.n_frames = 1 + self.n_samples // hop_length
        if board not in BOARDS:
            raise ValueError(f"Unknown board {board!r}. Supported: {sorted(BOARDS)}")
        self.board = board
        self.max_ram_kb = max_ram_kb
        self.plan = self._build_plan()
        self.arena = ArenaEstimator([LayerCost(p["name"], p["in_shape"], p["out_shape"]) for p in self.plan])

    # ------------------------------------------------------------------
    # Layer plan
    # ------------------------------------------------------------------

    def _param(self, layer: str, kind: str) -> np.ndarray:
        return self.flat[f"p/{layer}/{kind}"]

    def _build_plan(self) -> list[dict]:
        arch = self.arch
        kind = arch["type"]
        input_shape = tuple(arch["input_shape"])
        plan: list[dict] = []
        if kind in ("cnn", "distillation_cnn"):
            if len(input_shape) == 2:
                input_shape = (*input_shape, 1)
            H, W, C = input_shape
            plan.append({"op": "normalize", "name": "normalize", "in_shape": (H, W, C), "out_shape": (H, W, C)})
            filters = arch["filters"]
            for i, f in enumerate(filters):
                s = arch.get("first_stride", 1) if i == 0 else (arch.get("second_stride", 1) if i == 1 else 1)
                oh, ow = math.ceil(H / s), math.ceil(W / s)
                pad_h = max((oh - 1) * s + 3 - H, 0)
                pad_w = max((ow - 1) * s + 3 - W, 0)
                plan.append(
                    {
                        "op": "conv2d_relu", "name": f"conv{i}", "layer": f"Conv_{i}",
                        "in_shape": (H, W, C), "out_shape": (oh, ow, f),
                        "stride": s, "pt": pad_h // 2, "pl": pad_w // 2,
                    }
                )
                H, W, C = oh, ow, f
                strided = (i == 0 and arch.get("first_stride", 1) > 1) or (i == 1 and arch.get("second_stride", 1) > 1)
                if not strided:
                    oh, ow = H // 2, W // 2
                    plan.append({"op": "maxpool2d", "name": f"pool{i}", "in_shape": (H, W, C), "out_shape": (oh, ow, C)})
                    H, W = oh, ow
            plan.append({"op": "gap2d", "name": "gap", "in_shape": (H, W, C), "out_shape": (C,)})
            d0 = self._param("Dense_0", "kernel").shape[1]
            plan.append({"op": "dense", "name": "dense0", "layer": "Dense_0", "act": 1,
                         "in_shape": (C,), "out_shape": (d0,)})
            plan.append({"op": "dense", "name": "head", "layer": "Dense_1", "act": 2,
                         "in_shape": (d0,), "out_shape": (arch["n_classes"],)})
        elif kind == "mlp":
            D = int(np.prod(input_shape))
            plan.append({"op": "normalize", "name": "normalize", "in_shape": (D,), "out_shape": (D,)})
            hidden = arch["hidden_units"]
            prev = D
            for i, h in enumerate(hidden):
                plan.append({"op": "dense", "name": f"dense{i}", "layer": f"Dense_{i}", "act": 1,
                             "in_shape": (prev,), "out_shape": (h,)})
                prev = h
            plan.append({"op": "dense", "name": "head", "layer": f"Dense_{len(hidden)}", "act": 2,
                         "in_shape": (prev,), "out_shape": (arch["n_classes"],)})
        else:
            raise ValueError(
                f"Codegen supports mlp/cnn/distillation_cnn bundles; got {kind!r} "
                "(sequence models are not deployable to the C runtime, as in the reference)."
            )
        return plan

    # ------------------------------------------------------------------
    # File generation
    # ------------------------------------------------------------------

    def generate(self, out_dir: Path | str) -> Path:
        out_dir = Path(out_dir)
        src = out_dir / "src"
        src.mkdir(parents=True, exist_ok=True)
        if self.max_ram_kb is not None:
            self.arena.check_max_ram(self.max_ram_kb)
        logger.info("Arena plan:\n%s", self.arena.table())

        (src / "ml_kernels.h").write_text(ckernels.ML_KERNELS_H)
        (src / "ml_kernels.c").write_text(ckernels.ML_KERNELS_C)
        (src / "frontend.h").write_text(ckernels.FEATURES_H)
        (src / "frontend.c").write_text(
            ckernels.FEATURES_C_TEMPLATE.format(
                n_fft=self.n_fft, hop=self.hop_length, n_mels=self.n_mels,
                n_frames=self.n_frames, n_samples=self.n_samples,
            )
        )
        (src / "feat_data.h").write_text(self._gen_feat_data_h())
        (src / "feat_data.c").write_text(self._gen_feat_data_c())
        (src / "weights.h").write_text(self._gen_weights_h())
        (src / "weights.c").write_text(self._gen_weights_c())
        (src / "model.h").write_text(self._gen_model_h())
        (src / "model.c").write_text(self._gen_model_c())
        (src / "labels.h").write_text(self._gen_labels_h())
        from .firmware import AUDIO_H, AUDIO_I2S_CPP, AUDIO_PDM_CPP, AUDIO_STUB_CPP, NICLA_LD

        (src / "main.cpp").write_text(self._gen_main_cpp())
        (src / "audio.h").write_text(AUDIO_H)
        audio_kind = BOARDS[self.board]["audio"]
        (src / "audio.cpp").write_text({"pdm": AUDIO_PDM_CPP, "i2s": AUDIO_I2S_CPP, "stub": AUDIO_STUB_CPP}[audio_kind])
        (out_dir / "host_main.c").write_text(ckernels.HOST_MAIN_C)
        (out_dir / "platformio.ini").write_text(self._gen_platformio_ini())
        if self.board == "nicla_vision":
            (out_dir / "nicla_vision.ld").write_text(NICLA_LD)
        (out_dir / "codegen_report.json").write_text(
            json.dumps(
                {
                    "bundle": str(self.bundle_path),
                    "arch": self.arch["type"],
                    "board": self.board,
                    "labels": self.labels,
                    "arena_peak_kb": self.arena.peak_bytes / 1024,
                    "arena_buffer_kb": self.arena.buffer_bytes / 1024,
                    "frontend": {
                        "sample_rate": self.sample_rate, "n_mels": self.n_mels,
                        "n_fft": self.n_fft, "hop_length": self.hop_length,
                        "duration": self.duration, "n_frames": self.n_frames,
                    },
                },
                indent=2,
            )
        )
        logger.info("Generated C project -> %s", out_dir)
        return out_dir

    # -- headers / data ---------------------------------------------------

    def _gen_feat_data_h(self) -> str:
        return (
            "#ifndef FEAT_DATA_H\n#define FEAT_DATA_H\n\n"
            f"extern const float feat_hann[{self.n_fft}];\n"
            f"extern const float feat_mel_fb[{self.n_mels * (self.n_fft // 2 + 1)}];\n\n"
            "#endif\n"
        )

    def _gen_feat_data_c(self) -> str:
        hann = golden.hann_periodic(self.n_fft)
        fb = golden.mel_filterbank(self.sample_rate, self.n_fft, self.n_mels)
        return (
            '#include "feat_data.h"\n\n'
            "/* periodic Hann window + slaney mel filterbank (librosa contract;\n"
            " * generated from ops.golden — the same constants the JAX path uses) */\n"
            + _c_float_array("feat_hann", hann)
            + "\n"
            + _c_float_array("feat_mel_fb", fb)
        )

    def _weight_tensors(self) -> list[tuple[str, np.ndarray]]:
        tensors = []
        for p in self.plan:
            if p["op"] == "conv2d_relu":
                tensors.append((f"wt_{p['name']}_k", self._param(p["layer"], "kernel")))
                tensors.append((f"wt_{p['name']}_b", self._param(p["layer"], "bias")))
            elif p["op"] == "dense":
                tensors.append((f"wt_{p['name']}_k", self._param(p["layer"], "kernel")))
                tensors.append((f"wt_{p['name']}_b", self._param(p["layer"], "bias")))
        mean = np.asarray(self.norm_mean).ravel()
        inv_std = 1.0 / np.sqrt(np.asarray(self.norm_var).ravel() + 1e-6)
        tensors.append(("wt_norm_mean", mean))
        tensors.append(("wt_norm_inv_std", inv_std))
        return tensors

    def _gen_weights_h(self) -> str:
        lines = ["#ifndef WEIGHTS_H", "#define WEIGHTS_H", ""]
        for name, arr in self._weight_tensors():
            lines.append(f"extern const float {name}[{np.asarray(arr).size}];")
        lines += ["", "#endif", ""]
        return "\n".join(lines)

    def _gen_weights_c(self) -> str:
        parts = ['#include "weights.h"\n\n/* model weights in flash (HWIO conv layout) */\n']
        for name, arr in self._weight_tensors():
            parts.append(_c_float_array(name, arr))
        return "\n".join(parts)

    def _gen_labels_h(self) -> str:
        quoted = ",\n    ".join(f'"{l}"' for l in self.labels)
        return (
            "#ifndef LABELS_H\n#define LABELS_H\n\n"
            f"#define N_LABELS {len(self.labels)}\n"
            f"static const char *LABELS[N_LABELS] = {{\n    {quoted}\n}};\n\n#endif\n"
        )

    # -- model ------------------------------------------------------------

    def _gen_model_h(self) -> str:
        in_size = int(np.prod(self.plan[0]["in_shape"]))
        arena_floats = self.arena.buffer_bytes // 4 * 2  # two ping-pong halves
        return (
            "#ifndef MODEL_H\n#define MODEL_H\n\n#include <stddef.h>\n\n"
            f"#define MODEL_INPUT_SIZE {in_size}\n"
            f"#define MODEL_N_CLASSES {self.arch['n_classes']}\n"
            f"#define MODEL_ARENA_FLOATS {arena_floats}\n"
            f"#define MODEL_N_SAMPLES {self.n_samples}\n"
            f"#define MODEL_N_MELS {self.n_mels}\n"
            f"#define MODEL_N_FRAMES {self.n_frames}\n\n"
            "void model_run(const float *input, float *scores, float *arena);\n\n#endif\n"
        )

    def _gen_model_c(self) -> str:
        half = self.arena.buffer_bytes // 4
        lines = [
            '#include "model.h"',
            '#include "ml_kernels.h"',
            '#include "weights.h"',
            "#include <string.h>",
            "",
            "/* ping-pong forward pass over a single caller-provided arena */",
            "void model_run(const float *input, float *scores, float *arena) {",
            f"    float *buf_a = arena;",
            f"    float *buf_b = arena + {half};",
            "    const float *cur = input;",
            "    float *nxt = buf_a;",
        ]
        for p in self.plan:
            in_shape, out_shape = p["in_shape"], p["out_shape"]
            if p["op"] == "normalize":
                c = in_shape[-1]
                n = int(np.prod(in_shape))
                lines.append(f"    ml_normalize(cur, nxt, {n}, wt_norm_mean, wt_norm_inv_std, {c});")
            elif p["op"] == "conv2d_relu":
                h, w, cin = in_shape
                oh, ow, cout = out_shape
                s = p["stride"]
                lines.append(
                    f"    ml_conv2d_relu(cur, nxt, wt_{p['name']}_k, wt_{p['name']}_b, "
                    f"{h}, {w}, {cin}, {cout}, 3, 3, {s}, {s}, {p['pt']}, {p['pl']}, {oh}, {ow});"
                )
            elif p["op"] == "maxpool2d":
                h, w, c = in_shape
                oh, ow, _ = out_shape
                lines.append(f"    ml_maxpool2d(cur, nxt, {h}, {w}, {c}, 2, 2, 2, 2, {oh}, {ow});")
            elif p["op"] == "gap2d":
                h, w, c = in_shape
                lines.append(f"    ml_gap2d(cur, nxt, {h}, {w}, {c});")
            elif p["op"] == "dense":
                (i_dim,), (o_dim,) = in_shape, out_shape
                act = p["act"]
                is_last = p is self.plan[-1]
                dst = "scores" if is_last else "nxt"
                lines.append(f"    ml_dense(cur, {dst}, wt_{p['name']}_k, wt_{p['name']}_b, {i_dim}, {o_dim}, {act});")
                if is_last:
                    lines.append("    return;")
                    continue
            lines.append("    cur = nxt; nxt = (nxt == buf_a) ? buf_b : buf_a;")
        lines += ["}", ""]
        return "\n".join(lines)

    # -- firmware ----------------------------------------------------------

    def _gen_main_cpp(self) -> str:
        from .firmware import MAIN_CPP_TEMPLATE

        b0, b1, b2, a1, a2 = _notch_coeffs(self.sample_rate)
        return MAIN_CPP_TEMPLATE.format(
            sample_rate=self.sample_rate,
            n_samples=self.n_samples,
            b0=f"{b0:.9g}", b1=f"{b1:.9g}", b2=f"{b2:.9g}", a1=f"{a1:.9g}", a2=f"{a2:.9g}",
        )

    def _gen_platformio_ini(self) -> str:
        spec = BOARDS[self.board]
        if self.board == "generic":
            return (
                "[env:host]\nplatform = native\nbuild_flags = -O2 -lm\n"
                "; host-only build: compile host_main.c + src/*.c with gcc\n"
            )
        return (
            f"[env:{self.board}]\n"
            f"platform = {spec['platform']}\n"
            f"board = {spec['board']}\n"
            f"framework = {spec['framework']}\n"
            "build_flags = -O2\n"
            "monitor_speed = 115200\n"
            f"{spec['extra']}\n"
        )


def _notch_coeffs(sr: float, freq: float = 4000.0, q: float = 8.0):
    """RBJ biquad notch (kills the PDM clock artifact at 4 kHz;
    reference model_to_c.py:742-759)."""
    w0 = 2 * math.pi * freq / sr
    alpha = math.sin(w0) / (2 * q)
    b0, b1, b2 = 1.0, -2 * math.cos(w0), 1.0
    a0, a1, a2 = 1 + alpha, -2 * math.cos(w0), 1 - alpha
    return b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0
