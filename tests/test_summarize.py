"""Campaign summarizer: family-relative outlier flagging with member
identity annotations (VERDICT r4 next #6 / weak #5).

The bar is err > 3x the sweep median; a flagged member at one of the
two most aggressive k_cpt prices (or the shallowest SR depth) is
annotated as expected family behavior, anything else is UNEXPLAINED."""

import importlib.util
import os

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "summarize_campaign",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "summarize_campaign.py"))
sc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sc)


def _write_sweep(root, expt, errs):
    d = root / expt
    d.mkdir(parents=True)
    for i, err in enumerate(errs):
        np.save(d / f"{i:04d}-stats.npy",
                {"stats_ts": {"acc": 1.0 - err, "moc": 1e6 * (i + 1)}})


def test_outlier_flags_aggressive_price_vs_unexplained(tmp_path):
    # hybrid-ac is a k_cpt sweep in the registry: member 7 carries the
    # top price, so a big excursion there is expected; member 2 is not.
    errs = [0.05] * 8
    errs[7] = 0.40           # aggressive price -> expected
    errs[2] = 0.30           # mid-sweep -> unexplained
    _write_sweep(tmp_path, "hybrid-ac", errs)
    rows = dict(sc.sweep_rows(str(tmp_path)))
    flags = sc.outliers("hybrid-ac", rows["hybrid-ac"])
    assert len(flags) == 2
    joined = " ".join(flags)
    assert "k_cpt=6.4e-08" in joined and "aggressive price" in joined
    assert "UNEXPLAINED" in joined
    by_member = {f.split()[0]: f for f in flags}
    assert "aggressive price" in by_member["0007"]
    assert "UNEXPLAINED" in by_member["0002"]


def test_outlier_sr_depth_sweep_shallow_expected(tmp_path):
    # hybrid-sr is an SR depth sweep: depth-1's high err is capacity,
    # depth-8's is not.
    errs = [0.20, 0.05, 0.05, 0.05, 0.05, 0.05, 0.05, 0.18]
    _write_sweep(tmp_path, "hybrid-sr", errs)
    rows = dict(sc.sweep_rows(str(tmp_path)))
    flags = sc.outliers("hybrid-sr", rows["hybrid-sr"])
    assert len(flags) == 2
    by_member = {f.split()[0]: f for f in flags}
    assert "capacity-limited" in by_member["0000"]
    assert "depth=1" in by_member["0000"]
    assert "UNEXPLAINED" in by_member["0007"]
    assert "depth=8" in by_member["0007"]


def test_no_flags_within_bar(tmp_path):
    _write_sweep(tmp_path, "hybrid-ac", [0.05, 0.06, 0.07, 0.05,
                                         0.06, 0.08, 0.10, 0.14])
    rows = dict(sc.sweep_rows(str(tmp_path)))
    assert sc.outliers("hybrid-ac", rows["hybrid-ac"]) == []


def test_outlier_probe_retrain_explains(tmp_path):
    """A seed+100 probe retrain under <nets>-probe/ whose err is within
    the bar converts an UNEXPLAINED flag into a seed-instability
    annotation; a probe that is ALSO high marks it systematic."""
    errs = [0.05] * 8
    errs[7] = 0.18
    _write_sweep(tmp_path / "nets", "hybrid-sr", errs)
    probe = tmp_path / "nets-probe" / "hybrid-sr"
    probe.mkdir(parents=True)
    np.save(probe / "0007-stats.npy",
            {"stats_ts": {"acc": 0.93, "moc": 1e6}})
    rows = dict(sc.sweep_rows(str(tmp_path / "nets")))
    flags = sc.outliers("hybrid-sr", rows["hybrid-sr"],
                        probe_dir=str(tmp_path / "nets-probe"))
    assert len(flags) == 1 and "seed instability" in flags[0]
    np.save(probe / "0007-stats.npy",
            {"stats_ts": {"acc": 0.80, "moc": 1e6}})
    flags = sc.outliers("hybrid-sr", rows["hybrid-sr"],
                        probe_dir=str(tmp_path / "nets-probe"))
    assert len(flags) == 1 and "systematic" in flags[0]
