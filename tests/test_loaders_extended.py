"""Coverage for the remaining loaders/extractors: BIRDeep CSV loaders,
video extractors (cv2), MobileNetV2 embedding paths, text folder/JSON."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def birdeep_root(tmp_path_factory):
    """Minimal BIRDeep_AudioAnnotations layout: CSVs + Audios/ + images/."""
    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav

    root = tmp_path_factory.mktemp("birdeep")
    (root / "Audios" / "SITE1" / "2026_01_01").mkdir(parents=True)
    (root / "images" / "SITE1" / "2026_01_01").mkdir(parents=True)
    rows = ["path,specie,start_time,end_time,recorder,date,bbox"]
    rng = np.random.default_rng(0)
    for i in range(6):
        rel = f"SITE1/2026_01_01/SITE1_20260101_{i:06d}.WAV"
        wav_path = root / "Audios" / rel
        y = (0.4 * np.sin(2 * np.pi * (400 + 100 * i) * np.arange(32000) / 16000)).astype(np.float32)
        write_wav(wav_path, y, 16000)
        # matching PNG "spectrogram"
        from PIL import Image

        img = (rng.uniform(0, 255, (64, 128, 3))).astype(np.uint8)
        Image.fromarray(img).save((root / "images" / rel).with_suffix(".PNG"))
        specie = "Cisticola juncidis" if i % 2 == 0 else "Emberiza calandra"
        bbox = f'"[{i % 2}, 0.5, 0.5, 0.2, 0.3]"'
        rows.append(f"{rel},{specie},0.25,1.25,SITE1,2026_01_01,{bbox}")
    # an augmented row (excluded by default) and a too-short segment
    rows.append("Data Augmentation/SITE1/2026_01_01/aug.WAV,Cisticola juncidis,0.0,1.0,SITE1,2026_01_01,")
    rows.append("SITE1/2026_01_01/SITE1_20260101_000000.WAV,Cisticola juncidis,0.50,0.52,SITE1,2026_01_01,")
    csv = "\n".join(rows) + "\n"
    for name in ("train_file.csv", "dataset.csv"):
        (root / name).write_text(csv)
    return root


def test_birdeep_audio_loader(birdeep_root):
    from audio_edge_ml_pipeline_tpu.data.loaders import BIRDeepLoader

    loader = BIRDeepLoader(birdeep_root, split="train")
    items = list(loader)
    # 6 valid rows; augmented + sub-min-duration rows filtered
    assert len(items) == 6
    path, label, meta = items[0]
    assert path.exists() and label == "Cisticola juncidis"
    assert meta["start_time"] == 0.25 and meta["end_time"] == 1.25
    assert loader.species == ["Cisticola juncidis", "Emberiza calandra"]
    filt = BIRDeepLoader(birdeep_root, split="train", species_filter={"Emberiza calandra"})
    assert len(list(filt)) == 3
    # segment extraction through the mel extractor (start/end forwarded)
    from audio_edge_ml_pipeline_tpu.features import get

    fs = get("audio_mel_spec")(duration=1.0).extract_dataset(loader, max_samples=2)
    assert fs.features.shape == (2, 40, 101)


def test_birdeep_image_loader(birdeep_root):
    from audio_edge_ml_pipeline_tpu.data.loaders import BIRDeepImageLoader

    loader = BIRDeepImageLoader(birdeep_root, split="train")
    items = list(loader)
    assert len(items) == 6
    path, label, meta = items[0]
    assert path.suffix == ".PNG" and "bbox_norm" in meta
    assert meta["bbox_norm"] == [0.5, 0.5, 0.2, 0.3]
    # bbox-cropped classical image features
    from audio_edge_ml_pipeline_tpu.features import get

    fs = get("image_classical")(image_size=64).extract_dataset(loader, max_samples=2)
    assert fs.features.shape[1] > 1000 and np.isfinite(fs.features).all()


def test_text_folder_and_json_loaders(tmp_path):
    from audio_edge_ml_pipeline_tpu.data.loaders import TextFolderLoader, TextJSONLoader
    from audio_edge_ml_pipeline_tpu.features import get

    for c, words in [("rivers", "water stream flow"), ("forests", "tree leaf bark")]:
        d = tmp_path / "txt" / c
        d.mkdir(parents=True)
        for i in range(3):
            (d / f"{i}.txt").write_text(f"{words} doc {i}")
    tl = TextFolderLoader(tmp_path / "txt")
    fs = get("text_bow")(max_features=32).extract_dataset(tl)
    assert fs.n_classes == 2 and fs.features.shape[0] == 6

    docs = [{"text": f"sample {i}", "label": f"c{i % 2}", "extra": i} for i in range(4)]
    (tmp_path / "docs.json").write_text(json.dumps(docs))
    jl = TextJSONLoader(tmp_path / "docs.json")
    assert len(jl) == 4
    _, label, meta = next(iter(jl))
    assert label in ("c0", "c1") and "text" in meta and "extra" in meta


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("vid") / "clip.avi"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 64))
    if not w.isOpened():
        pytest.skip("no cv2 video codec available")
    rng = np.random.default_rng(3)
    for i in range(24):
        frame = np.full((64, 64, 3), i * 10 % 255, np.uint8)
        frame[:, : 8 * (i % 8)] = rng.integers(0, 255, 3, dtype=np.uint8)
        w.write(frame)
    w.release()
    return path


def test_video_extractors(video_file):
    from audio_edge_ml_pipeline_tpu.features import get

    vc = get("video_classical")(max_frames=6, frame_size=32, optical_flow=True)
    feat = vc.extract(video_file)
    assert feat.ndim == 1 and np.isfinite(feat).all()
    seq = get("video_frame_seq")(max_frames=4, frame_size=32)
    frames = seq.extract(video_file)
    assert frames.shape == (4, 32, 32, 3)
    assert 0.0 <= frames.min() and frames.max() <= 1.0


def test_video_folder_loader(video_file):
    from audio_edge_ml_pipeline_tpu.data.loaders import VideoFolderLoader

    root = video_file.parent.parent / "tree"
    d = root / "classA"
    d.mkdir(parents=True, exist_ok=True)
    import shutil

    shutil.copy2(video_file, d / "v0.avi")
    loader = VideoFolderLoader(root)
    assert len(loader) == 1
    path, label, meta = next(iter(loader))
    assert label == "classA" and path.suffix == ".avi"


def test_mobilenet_embedder_smoke(tmp_path):
    """Deterministic-init MobileNetV2 produces stable 1280-d embeddings."""
    from PIL import Image

    from audio_edge_ml_pipeline_tpu.features import get

    rng = np.random.default_rng(4)
    p = tmp_path / "img.png"
    Image.fromarray(rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)).save(p)
    ex = get("image_mobilenet_v2")(image_size=96)  # small input for CPU speed
    e1 = ex.extract(p)
    e2 = ex.extract(p)
    assert e1.shape == (1280,)
    np.testing.assert_allclose(e1, e2, atol=1e-6)  # deterministic
    assert np.abs(e1).max() > 0


def test_tabular_loader_formats(tmp_path):
    """Multi-format TabularLoader (reference tabular_loader.py:110-260):
    jsonl, sqlite (table autodetect + sql_query), drop_cols, max_rows,
    integer label_col."""
    import sqlite3

    import pandas as pd

    from audio_edge_ml_pipeline_tpu.data.loaders import TabularLoader

    df = pd.DataFrame({"a": [1, 2, 3, 4], "b": [0.5, 0.6, 0.7, 0.8],
                       "junk": list("wxyz"), "label": ["p", "q", "p", "q"]})
    jl = tmp_path / "rows.jsonl"
    jl.write_text("\n".join(df.to_json(orient="records", lines=True).splitlines()))
    t = TabularLoader(jl, label_col="label", drop_cols=["junk"], max_rows=3)
    rows = list(t)
    assert len(t) == 3
    assert rows[0][1] == "p" and "junk" not in rows[0][2] and rows[0][2]["a"] == 1

    db = tmp_path / "rows.sqlite"
    con = sqlite3.connect(db)
    df.to_sql("samples", con, index=False)
    con.close()
    t2 = TabularLoader(db, label_col=3)  # integer label_col -> "label"
    assert len(t2) == 4 and list(t2)[1][1] == "q"
    t3 = TabularLoader(db, sql_query="SELECT a, label FROM samples WHERE a > 2", label_col="label")
    assert len(t3) == 2 and set(list(t3)[0][2]) == {"a"}


def test_text_csv_and_json_loader_extras(tmp_path):
    """Delimiter sniffing / skip_header / index columns (text_loader.py:
    216-226) and records_key dict roots (text_loader.py:146-193)."""
    import json as _json

    from audio_edge_ml_pipeline_tpu.data.loaders import TextCSVLoader, TextJSONLoader

    csv = tmp_path / "docs.tsv"
    csv.write_text("# exported\ndoc\tcat\nriver flows\twater\ntall tree\tforest\n")
    t = TextCSVLoader(csv, text_col=0, label_col=1, skip_header=1)
    rows = list(t)
    assert len(t) == 2 and rows[0][1] == "water" and rows[0][2]["text"] == "river flows"

    j = tmp_path / "wrapped.json"
    j.write_text(_json.dumps({"meta": "x", "records": [
        {"text": "one", "label": "a"}, {"text": "two", "label": "b"}]}))
    tj = TextJSONLoader(j, records_key="records")
    assert len(tj) == 2 and list(tj)[1][1] == "b"
    tj2 = TextJSONLoader(j)  # first list-valued key found automatically
    assert len(tj2) == 2
