"""tools/archive_results.py: campaign-snapshot archive/restore roundtrip.

The archive tool keeps the compact campaign artifacts (stats descriptors,
MANIFEST.json, logs, figures) in the committed results/ tree while
excluding checkpoints; restore rehydrates a fresh machine without
clobbering live outputs."""

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "archive_results",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "archive_results.py"))
ar = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ar)


@pytest.fixture
def repo(tmp_path):
    nets = tmp_path / "nets" / "synth-sr"
    nets.mkdir(parents=True)
    (nets / "0000-stats.npy").write_bytes(b"stats0")
    (nets / "0000-log.txt").write_text("log line\n")
    (nets / "MANIFEST.json").write_text('{"dataset": "synthetic"}')
    (nets / "0000.npy").write_bytes(b"x" * 100)          # checkpoint
    (nets / "net.npy").write_bytes(b"x" * 100)           # adaptive ckpt
    (nets / "huge.npy").write_bytes(b"x" * 2 * 1024 * 1024)
    hist = nets / "0000-stats"
    hist.mkdir()
    (hist / "00000030.npy").write_bytes(b"snap")
    logs = tmp_path / "nets" / "campaign-logs"
    logs.mkdir()
    (logs / "campaign.log").write_text("=== start\n")
    (logs / "synth-sr.log").write_text("per-run stdout (excluded)\n")
    figs = tmp_path / "figures"
    figs.mkdir()
    (figs / "acc-eff.svg").write_text("<svg/>")
    return tmp_path


def test_archive_selects_compact_artifacts(repo):
    out = repo / "results"
    n_copied, n_kept = ar.archive(["nets", "figures"], str(out), 512,
                                  repo=str(repo))
    got = sorted(os.path.relpath(os.path.join(dp, f), out)
                 for dp, _, fs in os.walk(out) for f in fs)
    assert got == [
        "figures/acc-eff.svg",
        "nets/campaign-logs/campaign.log",
        "nets/synth-sr/0000-log.txt",
        "nets/synth-sr/0000-stats.npy",
        "nets/synth-sr/0000-stats/00000030.npy",
        "nets/synth-sr/MANIFEST.json",
    ]
    assert n_copied == len(got)
    # Idempotent: second run copies nothing.
    n_copied, n_kept = ar.archive(["nets", "figures"], str(out), 512,
                                  repo=str(repo))
    assert n_copied == 0 and n_kept == len(got) - 1  # campaign.log kept
    # separately (not double-counted in n_kept by the dedicated pass)


def test_archive_recopies_on_change(repo):
    out = repo / "results"
    ar.archive(["nets"], str(out), 512, repo=str(repo))
    stats = repo / "nets" / "synth-sr" / "0000-stats.npy"
    stats.write_bytes(b"stats0+updated")
    os.utime(stats, None)
    n_copied, _ = ar.archive(["nets"], str(out), 512, repo=str(repo))
    assert n_copied == 1
    assert (out / "nets" / "synth-sr" /
            "0000-stats.npy").read_bytes() == b"stats0+updated"


def test_archive_checkpoints_opt_in_with_cap(repo, capsys):
    """VERDICT r3 weak #1: per-net checkpoints are archived only with
    ckpt_max_kb > 0, subject to the per-file cap (skips printed), and
    restore plants them back where no live file exists."""
    out = repo / "results"
    big = repo / "nets" / "synth-sr" / "0001.npy"
    big.write_bytes(b"x" * 2 * 1024 * 1024)  # an over-cap "fatter" member
    ar.archive(["nets"], str(out), 512, repo=str(repo), ckpt_max_kb=1024)
    assert (out / "nets" / "synth-sr" / "0000.npy").exists()
    assert (out / "nets" / "synth-sr" / "net.npy").exists()
    assert not (out / "nets" / "synth-sr" / "0001.npy").exists()
    assert "skip checkpoint over --ckpt-max-kb" in capsys.readouterr().out
    # Restore: checkpoint lands on a fresh tree, never over a live file.
    fresh = repo / "fresh-vm"
    fresh.mkdir()
    ar.restore(str(out), repo=str(fresh))
    assert (fresh / "nets" / "synth-sr" /
            "0000.npy").read_bytes() == b"x" * 100
    (fresh / "nets" / "synth-sr" / "0000.npy").write_bytes(b"live")
    ar.restore(str(out), repo=str(fresh))
    assert (fresh / "nets" / "synth-sr" /
            "0000.npy").read_bytes() == b"live"


def test_restore_never_overwrites_live_files(repo, tmp_path):
    out = repo / "results"
    ar.archive(["nets", "figures"], str(out), 512, repo=str(repo))
    fresh = tmp_path / "fresh-vm"
    fresh.mkdir()
    n = ar.restore(str(out), repo=str(fresh))
    assert n == 6
    assert (fresh / "nets" / "synth-sr" /
            "0000-stats.npy").read_bytes() == b"stats0"
    assert not (fresh / "nets" / "synth-sr" / "0000.npy").exists()
    # A live (newer) file wins over the archived copy.
    live = fresh / "nets" / "synth-sr" / "0000-stats.npy"
    live.write_bytes(b"live-training-output")
    assert ar.restore(str(out), repo=str(fresh)) == 0
    assert live.read_bytes() == b"live-training-output"


def test_restore_skips_direct_results_artifacts(repo, tmp_path):
    """Direct results/ artifacts (bench JSONs, serving-frontier/, ...)
    live IN results/ and must not be replanted relative to the repo
    root — only snapshot roots (nets/, figures/, ...) are restored.
    Regression: the 2026-08-21 fresh-VM boot left junk duplicates of
    every direct artifact at the repo top level."""
    out = repo / "results"
    ar.archive(["nets", "figures"], str(out), 512, repo=str(repo))
    (out / "bench-r5-warmcheck.json").write_text('{"v": 1}')
    sf = out / "serving-frontier"
    sf.mkdir()
    (sf / "chain-frontier.json").write_text("{}")
    fresh = tmp_path / "fresh-vm"
    fresh.mkdir()
    ar.restore(str(out), repo=str(fresh))
    assert (fresh / "nets" / "synth-sr" / "0000-stats.npy").exists()
    assert (fresh / "figures" / "acc-eff.svg").exists()
    assert not (fresh / "bench-r5-warmcheck.json").exists()
    assert not (fresh / "serving-frontier").exists()
