"""Dataset preparation logic against hand-made fixtures
(reference scripts/prep-data)."""

import numpy as np
import pytest

from mpnn_tpu.data import prep
from mpnn_tpu.data.dataset import Dataset


def _fake_mnist_mat(n_per_cls=3):
    rng = np.random.RandomState(0)
    mat = {}
    for i in range(10):
        mat[f"train{i}"] = (rng.rand(n_per_cls, 784) * 255).astype(np.uint8)
        mat[f"test{i}"] = (rng.rand(2, 784) * 255).astype(np.uint8)
    return mat


def _fake_cifar_batches(n=8):
    rng = np.random.RandomState(1)
    def batch(k):
        return {"data": (rng.rand(k, 3072) * 255).astype(np.uint8),
                "labels": rng.randint(0, 10, (k, 1))}
    return [batch(n), batch(n)], [batch(n)]


def test_format_mnist():
    m = prep.format_mnist(_fake_mnist_mat())
    assert m["x0_tr"].shape == (30, 32, 32, 1)
    assert m["y_tr"].shape == (30, 10)
    assert m["x0_tr"].dtype == np.float32
    assert 0.0 <= m["x0_tr"].min() and m["x0_tr"].max() <= 1.0
    np.testing.assert_array_equal(m["m_sym"], np.zeros(10))
    # Labels block-ordered by class (reference prep-data:52-58).
    np.testing.assert_array_equal(np.argmax(m["y_tr"], 1),
                                  np.repeat(np.arange(10), 3))


def test_format_cifar10_gamma():
    """CIFAR pixels are gamma-decoded (v/255)^2.2 (reference prep-data:93-99)."""
    tr, ts = _fake_cifar_batches()
    c = prep.format_cifar10(tr, ts)
    assert c["x0_tr"].shape == (16, 32, 32, 3)
    assert c["x0_ts"].shape == (8, 32, 32, 3)
    v = tr[0]["data"][0, 0]
    expect = np.float32((np.float64(v) ** 2.2) / 255 ** 2.2)
    # data is reshaped (3,32,32) -> transposed to (32,32,3): first byte is
    # pixel (0,0) channel 0.
    np.testing.assert_allclose(c["x0_tr"][0, 0, 0, 0], expect, rtol=1e-6)
    np.testing.assert_array_equal(c["m_sym"], np.ones(10))


def test_superclass_projection():
    tr, ts = _fake_cifar_batches()
    c10 = prep.format_cifar10(tr, ts)
    c2 = prep.project_superclasses(c10, prep.CIFAR2_CLASSES)
    assert c2["y_tr"].shape == (16, 2)
    np.testing.assert_allclose(c2["y_tr"].sum(1), 1.0)
    # Class 7 (horse) maps to superclass 0; everything else to 1.
    cls10 = np.argmax(c10["y_tr"], 1)
    np.testing.assert_array_equal(np.argmax(c2["y_tr"], 1),
                                  np.where(cls10 == 7, 0, 1))


def test_recolor_seeded_and_min_distance():
    """Recoloring is deterministic under a seed and enforces the minimum
    gradient color distance (reference prep-data:144-152)."""
    x = np.random.RandomState(2).rand(5, 8, 8, 1).astype(np.float32)
    a = prep.recolor(x, np.random.RandomState(0))
    b = prep.recolor(x, np.random.RandomState(0))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (5, 8, 8, 3)
    # Endpoints v=0 / v=1 map to c0 / c1 with ||c1-c0|| >= 0.3.
    c0 = prep.recolor(np.zeros((1, 1, 1, 1), np.float32),
                      np.random.RandomState(7))[0, 0, 0]
    c1 = prep.recolor(np.ones((1, 1, 1, 1), np.float32),
                      np.random.RandomState(7))[0, 0, 0]
    assert np.sqrt(np.sum((c1 - c0) ** 2)) >= 0.3


def test_make_hybrid():
    """Hybrid keeps digits 0-4 + cifar classes {0,1,4,6,7}, remapped to 10
    one-hot classes with flip mask [0]*5+[1]*5 (reference prep-data:153-188)."""
    mnist = prep.format_mnist(_fake_mnist_mat())
    tr, ts = _fake_cifar_batches(16)
    cifar10 = prep.format_cifar10(tr, ts)
    h = prep.make_hybrid(mnist, cifar10, seed=0)
    np.testing.assert_array_equal(h["m_sym"], [0] * 5 + [1] * 5)
    assert h["x0_tr"].shape[1:] == (32, 32, 3)
    assert h["y_tr"].shape[1] == 10
    np.testing.assert_allclose(h["y_tr"].sum(1), 1.0)
    # Kept MNIST examples: 3 per digit 0-4 = 15 (recolored to RGB).
    n_mnist_kept = 15
    n_cifar_kept = sum(np.argmax(cifar10["y_tr"], 1) == c
                       for c in [0, 1, 4, 6, 7]).sum()
    assert len(h["x0_tr"]) == n_mnist_kept + n_cifar_kept
    # Classes are block-ordered 0..9 (reference prep-data:180-184).
    cls = np.argmax(h["y_tr"], 1)
    assert (np.diff(cls) >= 0).all()


def test_archive_roundtrip(tmp_path):
    """save_archive output loads through the Dataset's reference schema."""
    arch = prep.format_mnist(_fake_mnist_mat())
    path = str(tmp_path / "mini.npz")
    prep.save_archive(path, arch)
    ds = Dataset(path, device_put=False)
    assert ds.x0_shape == (32, 32, 1)
    assert ds.y_shape == (10,)


def test_synthetic_archives(tmp_path):
    names = prep.make_synthetic_archives(str(tmp_path), small=True)
    assert "hybrid.npz" in names
    ds = Dataset(str(tmp_path / "hybrid.npz"), device_put=False)
    np.testing.assert_array_equal(ds.m_sym, [0] * 5 + [1] * 5)


def test_synthetic_tiered_difficulty_split():
    """Tiered stand-in: easy half separable by nearest-centroid, hard half
    not (accuracy must depend on depth for reference-like acc-eff curves)."""
    import numpy as np
    from mpnn_tpu.data.synth import make_synthetic_tiered

    a = make_synthetic_tiered(n_tr=3000, n_ts=600, n_cls=10, seed=3)
    assert a["x0_tr"].shape == (3000, 32, 32, 3)
    assert a["m_sym"].tolist() == [0] * 5 + [1] * 5
    xtr, ytr = a["x0_tr"], a["y_tr"].argmax(1)
    xts, yts = a["x0_ts"], a["y_ts"].argmax(1)
    cent = np.stack([xtr[ytr == k].mean(0).ravel() for k in range(10)])
    d = ((xts.reshape(len(xts), -1)[:, None] - cent[None]) ** 2).sum(-1)
    pred = d.argmin(1)
    easy = yts < 5
    acc_easy = (pred[easy] == yts[easy]).mean()
    acc_hard = (pred[~easy] == yts[~easy]).mean()
    assert acc_easy > 0.95
    assert acc_hard < 0.7
    # values in [0,1], fp32 
    assert a["x0_tr"].dtype == np.float32
    assert a["x0_tr"].min() >= 0 and a["x0_tr"].max() <= 1


def test_synthetic_tiered_v2_hardness_knobs():
    """V2 hardness (synth.TIERED_V2): near-duplicate distractors correlate
    with class motifs, and the knobs flow through to the stamped images
    (measured effect: the depth/acc tradeoff survives the full 80k budget;
    docs/results-r1.md)."""
    import numpy as np
    from mpnn_tpu.data.synth import TIERED_V2, make_synthetic_tiered

    a = make_synthetic_tiered(n_tr=400, n_ts=100, n_cls=10, seed=3,
                              **TIERED_V2)
    assert a["x0_tr"].shape == (400, 32, 32, 3)
    assert a["m_sym"].tolist() == [0] * 5 + [1] * 5
    assert a["x0_tr"].dtype == np.float32
    assert float(a["x0_tr"].min()) >= 0.0 and float(a["x0_tr"].max()) <= 1.0
    # Same seed, v1 vs v2 knobs must produce different archives (the knobs
    # actually reach generation; RNG streams diverge at distractor setup).
    b = make_synthetic_tiered(n_tr=400, n_ts=100, n_cls=10, seed=3)
    assert np.abs(a["x0_tr"] - b["x0_tr"]).max() > 0.05


def test_prepare_from_files_end_to_end(tmp_path):
    """The real download pipeline's untar/loadmat/format/combine stages
    (prep.prepare_from_files) run offline against fixture files in the real
    on-disk formats: a scipy .mat MNIST archive and the CIFAR batches
    tarball (reference scripts/prep-data:20-136). Only urlretrieve is
    skipped."""
    import tarfile
    import scipy.io as io

    # MNIST .mat with the reference's train0..9/test0..9 uint8 rows.
    mat_path = str(tmp_path / "mnist.mat")
    io.savemat(mat_path, _fake_mnist_mat())

    # CIFAR tarball: cifar-10-batches-mat/{data_batch_1..5,test_batch}.mat.
    rng = np.random.RandomState(7)
    batch_dir = tmp_path / "cifar-10-batches-mat"
    batch_dir.mkdir()
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        io.savemat(str(batch_dir / f"{name}.mat"),
                   {"data": (rng.rand(6, 3072) * 255).astype(np.uint8),
                    "labels": rng.randint(0, 10, (6, 1))})
    tgz_path = str(tmp_path / "cifar10.tar.gz")
    with tarfile.open(tgz_path, "w:gz") as tar:
        tar.add(str(batch_dir), arcname="cifar-10-batches-mat")

    out = tmp_path / "data"
    names = prep.prepare_from_files(str(out), mat_path, tgz_path,
                                    verbose=False)
    assert names == sorted(["mnist.npz", "cifar-10.npz", "cifar-2.npz",
                            "cifar-5.npz", "hybrid.npz"])
    for name in names:
        ds = Dataset(str(out / name), device_put=False)
        assert ds.x0_tr.shape[1:] == (32, 32, 3) or name == "mnist.npz"
        assert ds.x0_tr.min() >= 0 and ds.x0_tr.max() <= 1
        assert np.allclose(ds.y_tr.sum(1), 1)
        assert ds.provenance is not None and not ds.provenance["synthetic"]
    hyb = Dataset(str(out / "hybrid.npz"), device_put=False)
    # 3-channel, 10 classes, flip mask [0]*5 + [1]*5 (prep-data:160).
    assert hyb.x0_tr.shape[1:] == (32, 32, 3)
    assert hyb.y_tr.shape[1] == 10
    np.testing.assert_array_equal(hyb.m_sym, [0] * 5 + [1] * 5)
    # Examples are regrouped BY CLASS in kept-class order (prep-data:
    # 176-188): labels come out sorted ascending, 0-4 = recolored digits,
    # 5-9 = the kept CIFAR classes.
    labels = hyb.y_tr.argmax(1)
    assert (np.diff(labels) >= 0).all()
    assert set(np.unique(labels)) <= set(range(10))


def test_synthetic_provenance_tagged(tmp_path):
    names = prep.make_synthetic_archives(str(tmp_path), small=True)
    for name in names:
        ds = Dataset(str(tmp_path / name), device_put=False)
        assert ds.provenance is not None and ds.provenance["synthetic"]


def test_recolor_golden_sequence():
    """The hybrid recolor RNG consumes the seeded stream EXACTLY as the
    reference (prep-data:144-152): per image, c0 = rand(3), then c1 =
    rand(3) redrawn while ||c1-c0|| < 0.3. Under RandomState(0) the very
    first c1 draw ([0.5449, 0.4237, 0.6459], d=0.2947) is rejected, so
    image 0's gradient endpoints are the 1st and 3rd draws, and image 1
    consumes draws 4-5 with no rejection. Pinning these exact values
    pins both the draw order and the rejection-loop consumption
    (VERDICT r4 next #7)."""
    x0 = np.zeros((2, 1, 1, 1), np.float32)   # v=0 -> c0 per image
    out0 = prep.recolor(x0, np.random.RandomState(0))
    np.testing.assert_allclose(
        out0[0, 0, 0], [0.5488135, 0.71518934, 0.60276335], atol=1e-6)
    np.testing.assert_allclose(
        out0[1, 0, 0], [0.3834415, 0.79172504, 0.5288949], atol=1e-6)
    x1 = np.ones((2, 1, 1, 1), np.float32)    # v=1 -> c1 per image
    out1 = prep.recolor(x1, np.random.RandomState(0))
    np.testing.assert_allclose(  # 3rd draw: the 2nd was rejected (d<0.3)
        out1[0, 0, 0], [0.4375872, 0.891773, 0.96366274], atol=1e-6)
    np.testing.assert_allclose(
        out1[1, 0, 0], [0.56804454, 0.92559665, 0.07103606], atol=1e-6)


def test_download_and_prepare_file_urls(tmp_path):
    """The DOWNLOAD path itself (download_and_prepare -> urlretrieve ->
    prepare_from_files) runs end-to-end against file:// URLs of
    full-schema fixture archives — the one L1 stage that had no
    integration evidence in this air-gapped environment (VERDICT r4
    next #7). Asserts the five output archives load through Dataset and
    the hybrid recolor matches the golden seeded gradient."""
    import tarfile
    import scipy.io as io

    mat_path = tmp_path / "mnist.mat"
    io.savemat(str(mat_path), _fake_mnist_mat())
    rng = np.random.RandomState(7)
    batch_dir = tmp_path / "cifar-10-batches-mat"
    batch_dir.mkdir()
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        io.savemat(str(batch_dir / f"{name}.mat"),
                   {"data": (rng.rand(6, 3072) * 255).astype(np.uint8),
                    "labels": rng.randint(0, 10, (6, 1))})
    tgz_path = tmp_path / "cifar10.tar.gz"
    with tarfile.open(str(tgz_path), "w:gz") as tar:
        tar.add(str(batch_dir), arcname="cifar-10-batches-mat")

    out = tmp_path / "data"
    names = prep.download_and_prepare(
        str(out), mnist_url=mat_path.as_uri(),
        cifar_url=tgz_path.as_uri())
    assert names == sorted(["mnist.npz", "cifar-10.npz", "cifar-2.npz",
                            "cifar-5.npz", "hybrid.npz"])
    for name in names:
        ds = Dataset(str(out / name), device_put=False)
        assert np.allclose(ds.y_tr.sum(1), 1)
        assert ds.provenance is not None and not ds.provenance["synthetic"]
    # Golden recolor check through the REAL pipeline: the first kept
    # hybrid train image is a recolored digit whose gradient came from
    # the seed-0 stream; its pixel values must lie on the segment
    # [c0, c1] of that stream (exact endpoint check needs v=0/1 pixels,
    # which real images need not contain — range containment pins the
    # (c0, c1) pair without depending on image content).
    hyb = Dataset(str(out / "hybrid.npz"), device_put=False)
    c0 = np.array([0.5488135, 0.71518934, 0.60276335], np.float32)
    c1 = np.array([0.4375872, 0.891773, 0.96366274], np.float32)
    first = np.asarray(hyb.x0_tr[0])  # (32, 32, 3), v in [0, 1]
    lo, hi = np.minimum(c0, c1), np.maximum(c0, c1)
    assert (first >= lo - 1e-5).all() and (first <= hi + 1e-5).all()
    # ... and the gradient direction matches: every pixel is
    # c0 + (c1 - c0) * v for a single scalar v.
    v = (first - c0) / (c1 - c0)
    assert np.ptp(v, axis=-1).max() < 1e-4
