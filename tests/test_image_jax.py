"""Parity: batched JAX image descriptors (ops.imgdsp) vs the per-sample
numpy oracle (features.image), plus the batched extract_dataset paths.

The numpy implementations define the contract (reference image/classical.py
semantics with skimage absent); the accelerator path must reproduce them —
LBP bit-exactly (shared f32 delta-form comparison), the histogram exactly
(dyadic bin edges), HOG/GLCM to f32-vs-f64 accumulation noise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_edge_ml_pipeline_tpu.features import image as fi
from audio_edge_ml_pipeline_tpu.ops import imgdsp


@pytest.fixture(scope="module")
def image_batch():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:128, 0:128]
    imgs = [
        rng.random((128, 128), dtype=np.float32),  # dense noise
        ((yy * yy / 127.0 + xx) / 256.0).astype(np.float32),  # smooth gradient
        # blocky: large constant regions exercise the LBP tie handling
        (np.kron(rng.random((16, 16)) > 0.5, np.ones((8, 8))) * 0.8 + 0.1).astype(np.float32),
        np.clip(rng.normal(0.5, 0.2, (128, 128)), 0, 1).astype(np.float32),
    ]
    return np.stack(imgs)


def test_hog_parity(image_batch):
    out = np.asarray(imgdsp.hog_features_batch(jnp.asarray(image_batch)))
    for i, g in enumerate(image_batch):
        ref = fi.hog_features(g)
        assert out[i].shape == ref.shape == (8100,)
        assert np.max(np.abs(out[i] - ref)) <= 1e-5


def test_hog_rectangular_geometry(image_batch):
    out = np.asarray(
        imgdsp.hog_features_batch(jnp.asarray(image_batch[:2]), cell=(16, 8), block=(1, 2))
    )
    for i, g in enumerate(image_batch[:2]):
        ref = fi.hog_features(g, cell=(16, 8), block=(1, 2))
        assert out[i].shape == ref.shape
        assert np.max(np.abs(out[i] - ref)) <= 1e-5


def test_lbp_parity_bit_exact(image_batch):
    out = np.asarray(imgdsp.lbp_histogram_batch(jnp.asarray(image_batch)))
    for i, g in enumerate(image_batch):
        ref = fi.lbp_histogram(g)
        assert out[i].shape == ref.shape == (26,)
        # same f32 delta-form comparisons -> identical histograms
        np.testing.assert_array_equal(out[i], ref.astype(np.float32))


def test_gray_hist_exact(image_batch):
    out = np.asarray(imgdsp.gray_hist_batch(jnp.asarray(image_batch)))
    for i, g in enumerate(image_batch):
        ref, _ = np.histogram(g, bins=64, range=(0.0, 1.0))
        ref = ref.astype(np.float32) / max(ref.sum(), 1)
        np.testing.assert_array_equal(out[i], ref)


def test_glcm_parity(image_batch):
    out = np.asarray(imgdsp.glcm_stats_batch(jnp.asarray(image_batch)))
    for i, g in enumerate(image_batch):
        ref = fi.glcm_stats(g)
        assert out[i].shape == ref.shape == (6,)
        # f32 stats vs the oracle's f64; values up to O(100) (contrast)
        assert np.max(np.abs(out[i] - ref)) <= 2e-4


def test_full_vector_parity(image_batch):
    out = np.asarray(imgdsp.classical_image_vector_batch(jnp.asarray(image_batch)))
    for i, g in enumerate(image_batch):
        ref = fi.classical_image_vector(g)
        assert out[i].shape == ref.shape == (8196,)
        assert np.max(np.abs(out[i] - ref)) <= 2e-4


@pytest.fixture()
def image_folder(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(11)
    for cls in ("a", "b"):
        d = tmp_path / "imgs" / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (90, 110), dtype=np.uint8)
            Image.fromarray(arr, mode="L").save(d / f"s{i}.png")
    return tmp_path / "imgs"


def test_image_extractor_batched_matches_per_sample(image_folder):
    """extract_dataset (device batch, incl. zero-padded final batch) must
    reproduce the per-sample extract() vectors in loader order."""
    from audio_edge_ml_pipeline_tpu.data.loaders import ImageFolderLoader

    ex = fi.ImageClassicalExtractor()
    ex.batch_size = 4  # 6 samples -> one full + one padded batch
    ex.use_device_batch = True  # exercise the device path on the CPU runner
    loader = ImageFolderLoader(image_folder)
    fs = ex.extract_dataset(loader)
    assert fs.features.shape == (6, 8196)
    per_sample = np.stack([ex.extract(p) for p, _, _ in loader])
    assert np.max(np.abs(fs.features - per_sample)) <= 2e-4
    assert fs.n_classes == 2


def test_video_extractor_batched_matches_per_sample(tmp_path):
    cv2 = pytest.importorskip("cv2")

    paths = []
    rng = np.random.default_rng(3)
    for cls in ("x", "y"):
        d = tmp_path / "vids" / cls
        d.mkdir(parents=True)
        p = d / "clip.avi"
        w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 64))
        if not w.isOpened():
            pytest.skip("no cv2 video codec available")
        for i in range(10):
            frame = np.full((64, 64, 3), (i * 20 + (cls == "y") * 7) % 255, np.uint8)
            frame[:, : 6 * (i % 8)] = rng.integers(0, 255, 3, dtype=np.uint8)
            w.write(frame)
        w.release()
        paths.append(p)

    from audio_edge_ml_pipeline_tpu.data.loaders import VideoFolderLoader
    from audio_edge_ml_pipeline_tpu.features.video import VideoClassicalExtractor

    ex = VideoClassicalExtractor(max_frames=6, frame_size=32)
    ex.use_device_batch = True  # exercise the device path on the CPU runner
    loader = VideoFolderLoader(tmp_path / "vids")
    fs = ex.extract_dataset(loader)
    per_sample = np.stack([ex.extract(p) for p, _, _ in loader])
    assert fs.features.shape == per_sample.shape
    assert np.max(np.abs(fs.features - per_sample)) <= 2e-4

def test_image_batched_skip_and_continue(image_folder):
    """A corrupt file inside a device batch is skipped (reference
    base.py:203-206 contract) and the remaining vectors keep loader order."""
    from audio_edge_ml_pipeline_tpu.data.loaders import ImageFolderLoader

    (image_folder / "a" / "s1.png").write_bytes(b"not a png")
    ex = fi.ImageClassicalExtractor()
    ex.batch_size = 4
    ex.use_device_batch = True
    loader = ImageFolderLoader(image_folder)
    fs = ex.extract_dataset(loader)
    assert fs.features.shape == (5, 8196)
    good = [p for p, _, _ in loader if p.name != "s1.png" or p.parent.name != "a"]
    per_sample = np.stack([ex.extract(p) for p in good])
    assert np.max(np.abs(fs.features - per_sample)) <= 2e-4
    assert fs.n_classes == 2
