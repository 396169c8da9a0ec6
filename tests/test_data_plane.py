"""Data plane: WAV I/O, loaders, registry, batched extract_dataset,
FeatureSet round-trip, pipeline CLI, label_map."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    subprocess.run(
        [sys.executable, str(REPO / "tools/make_synth_dataset.py"), str(root), "--classes", "4", "--per-class", "6"],
        check=True,
        cwd=REPO,
    )
    return root


def test_wav_roundtrip(tmp_path):
    from audio_edge_ml_pipeline_tpu.data.audio_io import load_audio, probe_audio, read_wav, write_wav

    y = (0.5 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    write_wav(tmp_path / "t.wav", y, 16000)
    back, sr = read_wav(tmp_path / "t.wav")
    assert sr == 16000 and back.shape == (16000, 1)
    np.testing.assert_allclose(back[:, 0], y, atol=1.0 / 32000)
    info = probe_audio(tmp_path / "t.wav")
    assert info["sample_rate"] == 16000 and info["n_channels"] == 1
    assert abs(info["duration"] - 1.0) < 1e-6
    # offset/duration slicing + resampling
    seg, sr2 = load_audio(tmp_path / "t.wav", sr=8000, offset=0.25, duration=0.5)
    assert sr2 == 8000
    assert abs(len(seg) - 4000) <= 2
    # stereo downmix
    write_wav(tmp_path / "st.wav", np.stack([y, -y], axis=1), 16000)
    mono, _ = load_audio(tmp_path / "st.wav", sr=16000)
    assert np.abs(mono).max() < 1e-4  # L/R cancel


def test_resample_tone_preserved(tmp_path):
    from audio_edge_ml_pipeline_tpu.data.audio_io import resample

    sr0, sr1 = 44100, 16000
    t = np.arange(sr0) / sr0
    y = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    z = resample(y, sr0, sr1)
    assert abs(len(z) - sr1) <= 2
    # dominant frequency still 1 kHz
    spec = np.abs(np.fft.rfft(z[200:-200] * np.hanning(len(z) - 400)))
    peak_hz = spec.argmax() * sr1 / (len(z) - 400)
    assert abs(peak_hz - 1000) < 10


def test_resample_ratio_near_coprime_snapped():
    """Pitch-shift rates like 16000->17959 are coprime; the exact ratio makes
    resample_poly design O(max(up,down)) FIR taps (~800 ms/clip measured).
    Standard rate pairs must stay exact; near-coprime pairs snap to a
    bounded-denominator rational within 1.5e-5 relative error. (The ratio
    bound IS the perf property — resample_poly designs its FIR fresh on
    every call with O(max(up, down)) taps — so no wall-clock assertion is
    needed.)"""
    from audio_edge_ml_pipeline_tpu.data.audio_io import _resample_ratio, resample

    for orig, target in [(44100, 16000), (48000, 16000), (22050, 16000),
                         (16000, 44100), (8000, 16000), (48000, 44100)]:
        up, down = _resample_ratio(orig, target)
        assert up / down == target / orig, (orig, target)

    up, down = _resample_ratio(16000, 17959)  # +2-semitone shift rate
    assert max(up, down) <= 256
    rel = abs(up / down - 17959 / 16000) / (17959 / 16000)
    assert rel <= 1.5e-5

    y = np.random.default_rng(0).standard_normal(16000 * 5).astype(np.float32)
    z = resample(y, 16000, 17959)
    assert abs(len(z) - 16000 * 5 * 17959 / 16000) <= 2


def test_resample_ratio_near_unity_not_snapped_to_noop():
    """Tiny pitch shifts give near-unity coprime ratios (e.g. 16000/15977);
    a 256-denominator snap would collapse them to 1/1 — a silent no-op
    resample with ~1e-3 rate error. The cap must escalate until the
    documented 1.5e-5 bound holds."""
    from audio_edge_ml_pipeline_tpu.data.audio_io import _resample_ratio

    for orig, target in [(15977, 16000), (16000, 15977), (16023, 16000),
                         (44101, 44100), (22051, 22050)]:
        up, down = _resample_ratio(orig, target)
        assert (up, down) != (1, 1), (orig, target)
        rel = abs(up / down - target / orig) / (target / orig)
        assert rel <= 1.5e-5, (orig, target, up, down, rel)


def test_fsc22_loader_split_determinism(synth_root):
    from audio_edge_ml_pipeline_tpu.data.loaders import FSC22Loader

    root = synth_root / "fsc22"
    tr1 = FSC22Loader(root, split="train")
    tr2 = FSC22Loader(root, split="train")
    assert len(tr1) == len(tr2) > 0
    files1 = [m["filename"] for _, _, m in tr1]
    files2 = [m["filename"] for _, _, m in tr2]
    assert files1 == files2
    va = FSC22Loader(root, split="validation")
    te = FSC22Loader(root, split="test")
    al = FSC22Loader(root, split="all")
    assert len(tr1) + len(va) + len(te) == len(al) == 24
    # splits are disjoint
    all_files = files1 + [m["filename"] for _, _, m in va] + [m["filename"] for _, _, m in te]
    assert len(set(all_files)) == len(all_files)
    # class filter
    some_class = tr1.class_names[0]
    filt = FSC22Loader(root, split="all", class_filter={some_class})
    assert filt.n_classes == 1 and len(filt) == 6


def test_audio_folder_loader_and_manifest(synth_root, tmp_path):
    from audio_edge_ml_pipeline_tpu.data.loaders import AudioFolderLoader

    root = synth_root / "audio_folder"
    loader = AudioFolderLoader(root)
    assert len(loader) == 24 and loader.n_classes == 4
    _, label, meta = next(iter(loader))
    assert meta["sample_rate"] == 16000 and meta["duration"] > 4.9
    # manifest filter
    items = list(loader)
    keep = [str(p.relative_to(root)) for p, _, _ in items[:5]]
    manifest = tmp_path / "split_manifest.json"
    manifest.write_text(json.dumps({"train": keep, "val": [], "test": []}))
    filt = AudioFolderLoader(root, manifest=manifest, manifest_split="train")
    assert len(filt) == 5
    with pytest.raises(ValueError):
        AudioFolderLoader(root, manifest=manifest)


def test_registry():
    from audio_edge_ml_pipeline_tpu import features as F

    names = F.list_extractors()
    for expected in [
        "audio_classical", "audio_mel_spec", "audio_waveform", "audio_cqt", "audio_mfcc_seq",
        "image_classical", "image_pixels", "image_mobilenet_v2",
        "text_tfidf", "text_bow", "text_char_ngram", "text_sentence_embed", "text_bert_tokens",
        "tabular_classical", "tabular_polynomial",
        "video_classical", "video_frame_seq", "video_mobilenet_v2_seq",
    ]:
        assert expected in names, expected
    with pytest.raises(KeyError):
        F.get("nope")


def test_batched_mel_extract_dataset_matches_golden(synth_root):
    from audio_edge_ml_pipeline_tpu import features as F
    from audio_edge_ml_pipeline_tpu.data.audio_io import load_audio
    from audio_edge_ml_pipeline_tpu.data.loaders import FSC22Loader
    from audio_edge_ml_pipeline_tpu.ops import golden as g

    loader = FSC22Loader(synth_root / "fsc22", split="train")
    ex = F.get("audio_mel_spec")(duration=5.0)
    fs = ex.extract_dataset(loader)
    assert fs.features.shape[1:] == (40, 501)
    assert fs.feature_type == "deep" and fs.modality == "audio"
    assert fs.n_classes == 4 and len(fs.label_names) == 4
    # golden check on sample 0 (label interning order = loader order)
    paths = [(p, m) for p, _, m in loader]
    y, _ = load_audio(paths[0][0], sr=16000)
    y = np.pad(y[:80000], (0, max(0, 80000 - len(y))))
    ref = g.mel_spec_feature(y, sr=16000)
    assert np.max(np.abs(fs.features[0] - ref)) <= 1e-5


def test_variable_length_masked_dataset(synth_root, tmp_path):
    """Clips of equal natural length, duration=None -> masked batch path."""
    from audio_edge_ml_pipeline_tpu import features as F
    from audio_edge_ml_pipeline_tpu.data.audio_io import load_audio, write_wav
    from audio_edge_ml_pipeline_tpu.data.loaders import AudioFolderLoader
    from audio_edge_ml_pipeline_tpu.ops import golden as g

    root = tmp_path / "varlen"
    n = 52341  # deliberately not a bucket multiple
    for c in range(2):
        d = root / f"c{c}"
        d.mkdir(parents=True)
        rng = np.random.default_rng(c)
        for i in range(3):
            y = (0.4 * np.sin(2 * np.pi * (300 + 200 * c) * np.arange(n) / 16000)
                 + 0.05 * rng.standard_normal(n)).astype(np.float32)
            write_wav(d / f"{i}.wav", y, 16000)
    loader = AudioFolderLoader(root)
    fs = F.get("audio_mel_spec")().extract_dataset(loader)
    T = 1 + n // 160
    assert fs.features.shape == (6, 40, T)
    y0, _ = load_audio(sorted((root / "c0").glob("*.wav"))[0], sr=16000)
    ref = g.mel_spec_feature(y0, sr=16000)
    assert np.max(np.abs(fs.features[0] - ref)) <= 1e-5


def test_multi_chunk_pipelined_order_and_skip(synth_root, tmp_path):
    """batch_size < n_samples drives the depth-1 decode/compute software
    pipeline across several chunks: features must keep loader order, labels
    must intern in first-occurrence order, and a corrupt file mid-stream is
    skipped without disturbing either (reference base.py:203-206)."""
    import shutil

    from audio_edge_ml_pipeline_tpu import features as F
    from audio_edge_ml_pipeline_tpu.data.loaders import AudioFolderLoader

    root = tmp_path / "chunks"
    src = sorted((synth_root / "fsc22").rglob("*.wav"))[:6]
    for c in range(2):
        d = root / f"c{c}"
        d.mkdir(parents=True)
        for i in range(3):
            shutil.copy(src[3 * c + i], d / f"{i}.wav")
    (root / "c0" / "1.wav").write_bytes(b"RIFFgarbage")
    loader = AudioFolderLoader(root)
    ex = F.get("audio_mel_spec")(duration=2.0)
    ex.batch_size = 3  # several chunks in flight through the device thread
    fs = ex.extract_dataset(loader)
    good = [(p, l) for p, l, _ in loader if not (p.parent.name == "c0" and p.name == "1.wav")]
    assert fs.features.shape[0] == len(good) == 5
    per_sample = np.stack([ex.extract(p) for p, _ in good])
    assert np.max(np.abs(fs.features - per_sample)) <= 1e-6
    # label interning order = first-occurrence order of the surviving items
    order, idx = [], {}
    for _, l in good:
        idx.setdefault(l, len(idx))
        order.append(idx[l])
    assert fs.labels.tolist() == order


def test_overlap_device_order_and_errors():
    """The shared depth-1 overlap driver yields results in chunk order and
    re-raises a process() failure instead of swallowing it in the future."""
    from audio_edge_ml_pipeline_tpu.features.base import _overlap_device

    out = list(_overlap_device(iter(range(7)), lambda c: c * 10))
    assert out == [(c, c * 10) for c in range(7)]
    assert list(_overlap_device(iter([]), lambda c: c)) == []

    def boom(c):
        if c == 2:
            raise RuntimeError("chunk 2 failed")
        return c

    seen = []
    with pytest.raises(RuntimeError, match="chunk 2 failed"):
        for chunk, res in _overlap_device(iter(range(5)), boom):
            seen.append(res)
    assert seen == [0, 1]  # everything before the failing chunk was flushed


def test_classical_extract_dataset(synth_root):
    from audio_edge_ml_pipeline_tpu import features as F
    from audio_edge_ml_pipeline_tpu.data.loaders import FSC22Loader

    loader = FSC22Loader(synth_root / "fsc22", split="validation")
    ex = F.get("audio_classical")(sample_rate=16000)
    fs = ex.extract_dataset(loader, max_samples=4)
    assert fs.features.shape == (4, 302)
    assert np.isfinite(fs.features).all()


def test_featureset_roundtrip(tmp_path):
    from audio_edge_ml_pipeline_tpu.features.base import FeatureSet
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline, apply_label_map

    fs = FeatureSet(
        features=np.arange(12, dtype=np.float32).reshape(4, 3),
        feature_type="classical",
        modality="audio",
        metadata=[{"i": i} for i in range(4)],
        labels=np.array([0, 1, 0, 2], np.int32),
        label_names=["a", "b", "c"],
    )
    FeaturePipeline.save(fs, tmp_path / "out")
    fs2 = FeaturePipeline.load(tmp_path / "out")
    np.testing.assert_array_equal(fs2.features, fs.features)
    np.testing.assert_array_equal(fs2.labels, fs.labels)
    assert fs2.label_names == fs.label_names
    assert fs2.n_classes == 3
    info = json.loads((tmp_path / "out" / "info.json").read_text())
    assert info == {
        "feature_type": "classical", "modality": "audio", "n_samples": 4,
        "feature_shape": [3], "n_classes": 3, "is_supervised": True,
    }
    # label_map collapse
    fs3 = apply_label_map(fs2, {"a": "x", "c": "x"})
    assert fs3.label_names == ["x", "b"]
    np.testing.assert_array_equal(fs3.labels, [0, 1, 0, 0])


def test_text_tabular_image_extractors(synth_root):
    from audio_edge_ml_pipeline_tpu import features as F
    from audio_edge_ml_pipeline_tpu.data.loaders import ImageFolderLoader, TabularLoader, TextCSVLoader

    tl = TextCSVLoader(synth_root / "text.csv", text_col="text", label_col="label")
    fs = F.get("text_tfidf")(max_features=64).extract_dataset(tl)
    assert fs.n_classes == 3 and fs.features.shape[0] == 60
    emb = F.get("text_sentence_embed")().extract(None, text="a river flows")
    assert emb.shape == (384,) and abs(np.linalg.norm(emb) - 1.0) < 1e-5
    toks = F.get("text_bert_tokens")(max_length=16).extract(None, text="hello world")
    assert toks.shape == (16,) and toks[0] == 101

    # corpus-fit backends: LSA embeddings separate topics; the fitted
    # vocabulary assigns dense frequency-ranked ids reused across documents
    lsa = F.get("text_sentence_embed")()
    fse = lsa.extract_dataset(TextCSVLoader(synth_root / "text.csv", text_col="text", label_col="label"))
    assert fse.features.shape == (60, 384)
    assert lsa._lsa is not None  # SVD actually fitted
    np.testing.assert_allclose(np.linalg.norm(fse.features, axis=1), 1.0, atol=1e-5)
    # same-class documents embed closer on average than cross-class
    sims = fse.features @ fse.features.T
    same = np.mean([sims[i, j] for i in range(60) for j in range(60)
                    if i != j and fse.labels[i] == fse.labels[j]])
    diff = np.mean([sims[i, j] for i in range(60) for j in range(60)
                    if fse.labels[i] != fse.labels[j]])
    assert same > diff

    bt = F.get("text_bert_tokens")(max_length=16)
    fsb = bt.extract_dataset(TextCSVLoader(synth_root / "text.csv", text_col="text", label_col="label"))
    assert fsb.features.shape == (60, 16) and bt._vocab
    # the most frequent corpus word gets the first dense id
    top_word = next(w for w, i in bt._vocab.items() if i == bt._ID_BASE)
    # fitted encode is deterministic and reuses ids across docs
    a = bt.extract(None, text=f"{top_word} {top_word}")
    assert a[1] == a[2] == bt._ID_BASE

    tab = TabularLoader(synth_root / "tabular.csv", label_col="label")
    fst = F.get("tabular_classical")().extract_dataset(tab)
    assert fst.n_classes == 3 and np.isfinite(fst.features).all()
    fsp = F.get("tabular_polynomial")().extract_dataset(tab)
    assert fsp.features.shape[1] > fst.features.shape[1]

    il = ImageFolderLoader(synth_root / "images")
    fsi = F.get("image_classical")().extract_dataset(il, max_samples=6)
    assert fsi.features.shape[1] == 8196  # HOG 8100 + LBP 26 + hist 64 + GLCM 6
    fpx = F.get("image_pixels")(image_size=32).extract_dataset(il, max_samples=3)
    assert fpx.features.shape == (3, 32, 32, 1)


def test_pipeline_cli_end_to_end(synth_root, tmp_path):
    out = tmp_path / "cli_out"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.features.pipeline",
            "--loader", "fsc22", "--dataset", str(synth_root / "fsc22"),
            "--extractor", "audio_mel_spec", "--split", "validation",
            "--output", str(out), "--max-samples", "4",
        ],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert (out / "features.npy").exists() and (out / "info.json").exists()
    feats = np.load(out / "features.npy")
    assert feats.shape[0] == 4 and feats.shape[1] == 40


def test_classical_mixed_lengths_exact(tmp_path):
    """audio_classical with mixed clip lengths matches per-clip golden
    exactly (exact-length grouping; masked padding would contaminate the
    savgol deltas near the boundary)."""
    from audio_edge_ml_pipeline_tpu import features as F
    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav
    from audio_edge_ml_pipeline_tpu.data.loaders import AudioFolderLoader
    from audio_edge_ml_pipeline_tpu.ops import golden as g

    sr = 22050
    root = tmp_path / "mixed"
    rng = np.random.default_rng(11)
    lengths = [44100, 66150, 44100, 52000]
    d = root / "x"
    d.mkdir(parents=True)
    clips = []
    for i, L in enumerate(lengths):
        y = (0.4 * np.sin(2 * np.pi * (200 + 90 * i) * np.arange(L) / sr)
             + 0.04 * rng.standard_normal(L)).astype(np.float32)
        write_wav(d / f"{i}.wav", y, sr)
        clips.append(y)
    loader = AudioFolderLoader(root)
    ex = F.get("audio_classical")(sample_rate=sr)
    fs = ex.extract_dataset(loader)
    assert fs.features.shape == (4, 302)
    from audio_edge_ml_pipeline_tpu.data.audio_io import load_audio

    for i, (path, _, _) in enumerate(loader):
        y, _ = load_audio(path, sr=sr)
        ref = g.classical_feature_vector(y, sr=sr)
        scale = np.maximum(np.abs(ref), 1.0)
        rel = np.max(np.abs(fs.features[i] - ref) / scale)
        assert rel <= 1e-4, f"clip {i}: {rel:.2e}"


def _riff(fmt_tag, bits, rate, payload, channels=1, extensible=False,
          pre_chunks=b"", data_size=None):
    """Hand-assemble a RIFF/WAVE byte string (no library involved) so the
    reader is tested against the container spec, not against write_wav."""
    import struct

    block = channels * bits // 8
    if extensible:
        # 40-byte fmt: cbSize=22, valid bits, channel mask, SubFormat GUID
        guid = struct.pack("<H", fmt_tag) + b"\x00\x00" + bytes(12)
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, channels, rate, rate * block,
                          block, bits, 22, bits, 0) + guid
    else:
        fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate, rate * block, block, bits)
    chunks = pre_chunks
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) % 2:
        chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", data_size if data_size is not None else len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_reader_format_matrix(tmp_path):
    """Decode every container variant the codec claims (docstring: RIFF PCM
    8/16/24/32-bit + IEEE float, extensible, word-aligned stray chunks)
    from hand-assembled bytes with known sample values."""
    import struct

    from audio_edge_ml_pipeline_tpu.data.audio_io import read_wav

    ref = np.array([0.0, 0.5, -0.5, 0.25], np.float64)

    def check(name, buf, atol, expect=ref):
        p = tmp_path / name
        p.write_bytes(buf)
        x, sr = read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(x[:, 0], expect, atol=atol, err_msg=name)

    i16 = struct.pack("<4h", *(int(v * 32768) if v < 0 else int(v * 32767) for v in ref))
    check("i16.wav", _riff(1, 16, 16000, i16), 1 / 32000)
    i8 = bytes(int(v * 128) + 128 if v < 0 else int(v * 127) + 128 for v in ref)
    check("i8.wav", _riff(1, 8, 16000, i8), 1 / 120)
    i32 = struct.pack("<4i", *(int(v * 2147483647) for v in ref))
    check("i32.wav", _riff(1, 32, 16000, i32), 1e-6)
    i24 = b"".join(int(v * 8388607).to_bytes(3, "little", signed=True) for v in ref)
    check("i24.wav", _riff(1, 24, 16000, i24), 1e-6)
    check("f32.wav", _riff(3, 32, 16000, np.asarray(ref, "<f4").tobytes()), 1e-7)
    check("f64.wav", _riff(3, 64, 16000, np.asarray(ref, "<f8").tobytes()), 1e-7)
    # WAVE_FORMAT_EXTENSIBLE wrapping PCM16 and FLOAT32
    check("ext_pcm.wav", _riff(1, 16, 16000, i16, extensible=True), 1 / 32000)
    check("ext_f32.wav", _riff(3, 32, 16000, np.asarray(ref, "<f4").tobytes(),
                               extensible=True), 1e-7)
    # stray odd-sized chunk before fmt/data must be skipped via word alignment
    stray = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    check("stray.wav", _riff(1, 16, 16000, i16, pre_chunks=stray), 1 / 32000)
    # data chunk whose declared size overruns the file: clamp, don't crash
    check("trunc.wav", _riff(1, 16, 16000, i16, data_size=1 << 20), 1 / 32000)
    # stereo interleave -> (n, 2)
    st = struct.pack("<8h", *[int(v * 32767) for pair in zip(ref, -ref) for v in pair])
    p = tmp_path / "stereo.wav"
    p.write_bytes(_riff(1, 16, 16000, st, channels=2))
    x, _ = read_wav(p)
    assert x.shape == (4, 2)
    np.testing.assert_allclose(x[:, 1], -x[:, 0], atol=1 / 16000)
    # non-WAV bytes are a clean ValueError
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"ID3\x00 not audio")
    with pytest.raises(ValueError, match="RIFF"):
        read_wav(bad)
