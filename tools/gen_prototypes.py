#!/usr/bin/env python
"""Generate per-class mean mel prototypes as uint8 C arrays for on-device
MSE diagnostics (contract of reference tools/gen_prototypes.py:1-30).

Usage: python tools/gen_prototypes.py --features data/processed/fsc22_mel_train \
           [--classes Fire Chainsaw ...] \
           [--out-dir deploy/project | --output prototypes.h]

With --out-dir (reference layout) the header lands in <out-dir>/include/
so a generated PlatformIO project picks it up directly; --classes selects
and orders the prototypes to match the deployed model's output order.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def generate(features_dir: Path, output: Path, classes: list[str] | None = None) -> None:
    feats = np.load(features_dir / "features.npy")
    labels = np.load(features_dir / "labels.npy")
    all_names = json.loads((features_dir / "label_names.json").read_text())
    requested = list(classes) if classes else list(all_names)
    names: list[str] = []
    protos = []
    for name in requested:
        if name not in all_names:
            raise SystemExit(f"class {name!r} not found; available: {all_names}")
        rows = feats[labels == all_names.index(name)]
        if len(rows) == 0:
            # drop the name too, so PROTO_N_CLASSES / proto_N stay consistent
            print(f"skipping {name!r}: no samples in this FeatureSet")
            continue
        mean = rows.mean(axis=0)
        names.append(name)
        protos.append(np.clip(np.round(mean * 255.0), 0, 255).astype(np.uint8))
    if not protos:
        raise SystemExit("no requested class has any samples — nothing to emit")
    lines = [
        "/* per-class mean mel prototypes (uint8, features scaled x255) */",
        "#ifndef PROTOTYPES_H",
        "#define PROTOTYPES_H",
        "",
        f"#define PROTO_N_CLASSES {len(names)}",
        f"#define PROTO_SIZE {protos[0].size}",
        "",
    ]
    for c, (name, p) in enumerate(zip(names, protos)):
        vals = ", ".join(str(int(v)) for v in p.ravel())
        lines.append(f"/* {name} */")
        lines.append(f"static const unsigned char proto_{c}[PROTO_SIZE] = {{ {vals} }};")
    ptrs = ", ".join(f"proto_{c}" for c in range(len(names)))
    lines += [
        "",
        f"static const unsigned char *PROTOTYPES[PROTO_N_CLASSES] = {{ {ptrs} }};",
        "",
        "#endif",
        "",
    ]
    output.write_text("\n".join(lines))
    print(f"{len(names)} prototypes ({protos[0].size} values each) -> {output}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--features", "--features-dir", dest="features", required=True, type=Path)
    ap.add_argument("--classes", nargs="+", default=None,
                    help="ordered class names matching the model output order")
    ap.add_argument("--out-dir", type=Path, default=None,
                    help="PlatformIO project root — header written to <out-dir>/include/")
    ap.add_argument("--output", type=Path, default=Path("prototypes.h"))
    args = ap.parse_args()
    output = args.output
    if args.out_dir:
        inc = args.out_dir / "include"
        inc.mkdir(parents=True, exist_ok=True)
        output = inc / "prototypes.h"
    generate(args.features, output, classes=args.classes)


if __name__ == "__main__":
    main()
