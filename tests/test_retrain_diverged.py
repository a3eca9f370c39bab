"""Divergence retry policy (tools/retrain_diverged.py): dead-member
detection from final stats descriptors, and evidence-preserving renames
that keep diverged trajectories out of the figure CLIs' globs."""

import importlib.util
import os
from glob import glob

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "retrain_diverged",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "retrain_diverged.py"))
rd = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rd)


def _desc(acc, n_cls=10):
    """Minimal descriptor with the fields the scanner reads."""
    return {"stats_ts": {"acc": acc},
            "root": {"sinks": [{"stats_ts": {"p_cor_by_cls": [0.0] * n_cls},
                                "sinks": []}]}}


@pytest.fixture
def expt_dir(tmp_path):
    d = tmp_path / "cifar10-x"
    d.mkdir()
    for i, acc in enumerate([0.104, 0.95, 0.61]):
        np.save(d / ("%.4i-stats.npy" % i), _desc(acc))
        (d / ("%.4i-log.txt" % i)).write_text("trajectory\n")
        (d / ("%.4i.npy" % i)).write_bytes(b"ckpt")
        snap = d / ("%.4i-stats" % i)
        snap.mkdir()
        (snap / "00002500.npy").write_bytes(b"snap")
    return d


def test_diverged_detection_uses_descriptor_chance_level(expt_dir):
    dead = rd.diverged_members(str(expt_dir))
    # 0.104 < 1.5/10; 0.61 (a heavily k_cpt-penalized member) is NOT dead.
    assert [(i, n) for i, _, n in dead] == [(0, 10)]


def test_diverged_detection_5class(tmp_path):
    d = tmp_path / "cifar5-x"
    d.mkdir()
    np.save(d / "0000-stats.npy", _desc(0.194, n_cls=5))
    np.save(d / "0001-stats.npy", _desc(0.35, n_cls=5))
    assert [i for i, _, _ in rd.diverged_members(str(d))] == [0]


def test_low_class_count_uses_additive_threshold(tmp_path):
    """chance + 5pp, not a multiple of chance: a legitimate 0.70-acc
    cifar2 member must NOT be condemned (1.5x chance would put the bar
    at 0.75 there)."""
    d = tmp_path / "cifar2-x"
    d.mkdir()
    np.save(d / "0000-stats.npy", _desc(0.70, n_cls=2))
    np.save(d / "0001-stats.npy", _desc(0.52, n_cls=2))  # at chance
    assert [i for i, _, _ in rd.diverged_members(str(d))] == [1]


def test_interrupted_retry_hole_is_redetected(expt_dir):
    """A member preserved by preserve_diverged whose retrain never
    completed (no canonical stats file) must stay visible to the
    scanner — and members after the hole must still be scanned."""
    rd.preserve_diverged(str(expt_dir), 0, seed=0)
    # Simulate member 2 also diverging, with the hole at 0 unfilled.
    np.save(expt_dir / "0002-stats.npy", _desc(0.102))
    dead = rd.diverged_members(str(expt_dir))
    assert [i for i, _, _ in dead] == [0, 2]


def test_preserve_diverged_mirrors_results_archive(tmp_path):
    """The committed results/ copy of a diverged member is renamed in
    lockstep, so a VM death before the next archive pass cannot
    resurrect the dead member via --restore."""
    (tmp_path / "nets" / "cifar10-x").mkdir(parents=True)
    mirror = tmp_path / "results" / "nets" / "cifar10-x"
    mirror.mkdir(parents=True)
    live = tmp_path / "nets" / "cifar10-x"
    for d in (live, mirror):
        np.save(d / "0000-stats.npy", _desc(0.104))
        (d / "0000-log.txt").write_text("trajectory\n")
        (d / "0000.npy").write_bytes(b"ckpt")
    rd.preserve_diverged(str(live), 0, seed=0)
    for d in (live, mirror):
        assert not (d / "0000-stats.npy").exists()
        assert (d / "0000-stats-diverged-seed0.npy").exists()
        assert not (d / "0000.npy").exists()


def test_preserve_diverged_renames_and_drops_ckpt(expt_dir):
    rd.preserve_diverged(str(expt_dir), 0, seed=0)
    names = sorted(os.path.basename(p) for p in glob(str(expt_dir / "0000*")))
    assert names == ["0000-log-diverged-seed0.txt",
                     "0000-stats-diverged-seed0",
                     "0000-stats-diverged-seed0.npy"]
    # The figure CLIs' final-stats glob no longer sees member 0, and the
    # preserved names don't collide with it.
    hits = glob(str(expt_dir / "*-stats.npy"))
    assert sorted(os.path.basename(p) for p in hits) == [
        "0001-stats.npy", "0002-stats.npy"]
    # A chance-level checkpoint is dropped, not archived.
    assert not os.path.exists(expt_dir / "0000.npy")
