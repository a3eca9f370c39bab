"""Training driver (output contract + resume) and figure generation from
real driver outputs."""

import os
from glob import glob

import numpy as np
import pytest

from mpnn_tpu.data import synth


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    """Run the real driver on a tiny synthetic experiment; share outputs."""
    root = tmp_path_factory.mktemp("driver")
    data_dir = root / "data"
    data_dir.mkdir()
    np.savez_compressed(data_dir / "synth.npz",
                        synth.make_synthetic(n_tr=128, n_ts=64, h=32, w=32,
                                             n_cls=10, seed=0))
    from mpnn_tpu.train import train_experiment
    train_experiment("synth-ac", n_iter=10, t_log=5, batch_size=16,
                     net_indices=[0], data_root=str(root),
                     out_root=str(root / "nets"), verbose=False)
    return root


def test_output_layout(trained_dir):
    """Files match the reference layout (scripts/train-nets:144-157)."""
    out = trained_dir / "nets" / "synth-ac"
    assert (out / "0000-stats.npy").exists()
    assert (out / "0000-log.txt").exists()
    assert (out / "0000.npy").exists()
    snaps = sorted(glob(str(out / "0000-stats" / "*.npy")))
    assert [os.path.basename(p) for p in snaps] == [
        "00000005.npy", "00000010.npy"]
    log_text = (out / "0000-log.txt").read_text()
    assert log_text.count("┌") == 2  # one rendered tree per epoch


def test_resume_continues(trained_dir):
    """--resume picks up at the checkpointed step and extends the run."""
    from mpnn_tpu.train import train_experiment
    train_experiment("synth-ac", n_iter=15, t_log=5, batch_size=16,
                     net_indices=[0], data_root=str(trained_dir),
                     out_root=str(trained_dir / "nets"), verbose=False,
                     resume=True)
    out = trained_dir / "nets" / "synth-ac"
    snaps = sorted(glob(str(out / "0000-stats" / "*.npy")))
    assert os.path.basename(snaps[-1]) == "00000015.npy"
    from mpnn_tpu.utils.serdes import read_net
    _, _, _, extra = read_net(str(out / "0000.npy"))
    assert int(extra["t"]) == 15


def test_fresh_run_truncates_log(trained_dir, tmp_path):
    """A NON-resumed retrain overwrites stats AND resets the rendered
    log: append-mode logs used to accumulate bitwise-identical
    trajectories across fresh retrains (ADVICE r3 #1). Resume (covered
    above) keeps appending the single continuous trajectory."""
    from mpnn_tpu.train import train_experiment
    out_root = tmp_path / "nets"
    for _ in range(2):
        train_experiment("synth-ac", n_iter=5, t_log=5, batch_size=16,
                         net_indices=[0], data_root=str(trained_dir),
                         out_root=str(out_root), verbose=False)
    log_text = (out_root / "synth-ac" / "0000-log.txt").read_text()
    assert log_text.count("┌") == 1  # one tree, not two concatenated runs


def test_figures_from_driver_outputs(trained_dir):
    """All figure paths work against real driver outputs."""
    from mpnn_tpu.viz import loading, acc_eff, nld, routing
    nets_dir = str(trained_dir / "nets")
    fig_dir = str(trained_dir / "figures")
    logs = loading.load_experiment_logs(nets_dir)
    assert "synth-ac" in logs and len(logs["synth-ac"]) == 1

    p = acc_eff.plot_all_experiments(logs, fig_dir)
    assert p and os.path.exists(p)

    p = nld.render_experiment_grid(logs, "synth-ac",
                                   os.path.join(fig_dir, "nld.pdf"))
    assert p and os.path.exists(p)
    p = nld.render_experiment_grid(logs, "synth-ac",
                                   os.path.join(fig_dir, "nld-cls.pdf"),
                                   by_class=True)
    assert p and os.path.exists(p)

    p = routing.plot_routing_hists(nets_dir, "synth-ac", (0,), fig_dir)
    assert p and os.path.exists(p)
    m = routing.stop_mass_history(nets_dir, "synth-ac", 0)
    assert m.shape[0] == 3  # three snapshots (5, 10, 15)
    # Each epoch's stopping mass sums to ~1 over reachable depths.
    np.testing.assert_allclose(m.sum(axis=1), 1.0, rtol=1e-4)
    # Rows are in TRAINING order: row 0 = the earliest snapshot.
    snaps = loading.load_snapshots(nets_dir, "synth-ac", 0)
    first = loading.chain_stop_mass(snaps[0])
    np.testing.assert_allclose(m[0, :len(first)], first, rtol=1e-6)

    frames = nld.render_video_frames(
        loading.load_snapshots(nets_dir, "synth-ac", 0),
        os.path.join(fig_dir, "vid"))
    assert len(frames) == 3
    gif = nld.assemble_gif(frames, os.path.join(fig_dir, "vid.gif"))
    assert gif and os.path.exists(gif)


def test_reference_bespoke_nlds(trained_dir):
    """The reference's exact nld figure set (make-nlds:42-234, VERDICT r2
    Next #5): all five constructors run on real driver descriptors, the
    emitted inventory matches the reference's nld-0/nld-1 names, and the
    layout geometry follows the reference's angular-fan recursion."""
    from mpnn_tpu.viz import loading, nld
    logs = loading.load_experiment_logs(str(trained_dir / "nets"))
    fig_dir = str(trained_dir / "figures-bespoke")
    os.makedirs(fig_dir, exist_ok=True)  # constructors write to the given
    # path; only render_reference_nlds creates the directory itself
    descs = logs["synth-ac"]

    # Chain bounds: an n-deep chain spans exactly x in [0, depth] (every
    # child sits at x+cos(0)=x+1, y unchanged — make-nlds:50-53).
    x0, x1, y0, y1 = nld._ref_bounds(descs[0]["root"]["sinks"][0], 0, 0, 1)
    assert (x0, y0, y1) == (0, 0, 0)
    assert x1 == int(x1) and x1 >= 1

    for fn in (nld.make_chain_acc_nld, nld.make_chain_cls_nld):
        p = fn(descs, os.path.join(fig_dir, fn.__name__ + ".pdf"))
        assert os.path.exists(p)
    for fn in (nld.make_tree_acc_nld, nld.make_tree_cls_nld):
        p = fn(descs[0], os.path.join(fig_dir, fn.__name__ + ".pdf"))
        assert os.path.exists(p)
    p = nld.make_chain_acc_and_cls_nld(
        descs, os.path.join(fig_dir, "combined.pdf"))
    assert os.path.exists(p)

    # The emitted inventory carries the reference's exact names,
    # skip-missing like viz/pres.py: synth-ac stands in for both entries.
    inv = {"nld-0.pdf": ("chain_acc_and_cls", "synth-ac", None),
           "nld-1.pdf": ("tree_cls", "synth-ac", 0)}
    written = nld.render_reference_nlds(logs, fig_dir, inventory=inv)
    assert sorted(os.path.basename(w) for w in written) == [
        "nld-0.pdf", "nld-1.pdf"]
    assert nld.render_reference_nlds({}, fig_dir) == []
    assert set(nld.REFERENCE_NLDS) == {"nld-0.pdf", "nld-1.pdf"}


def test_adaptive_driver(tmp_path):
    """train-adaptive-nets contract: one stats file per k_cpt + net.npy
    (reference scripts/train-adaptive-nets:101-107)."""
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    np.savez_compressed(data_dir / "synth.npz",
                        synth.make_synthetic(n_tr=96, n_ts=48, h=32, w=32,
                                             n_cls=10, seed=1))
    from mpnn_tpu.train import train_adaptive_experiment
    from mpnn_tpu import experiments as cfg
    train_adaptive_experiment("synth-ac-dynkcpt", n_iter=6, batch_size=16,
                              data_root=str(tmp_path),
                              out_root=str(tmp_path / "nets"),
                              verbose=False)
    out = tmp_path / "nets" / "synth-ac-dynkcpt"
    stats = sorted(glob(str(out / "*-stats.npy")))
    assert len(stats) == len(cfg.k_cpts)
    assert (out / "net.npy").exists()
    d = np.load(stats[0], allow_pickle=True)[()]
    assert d["type"] == "ActorNet"


@pytest.fixture()
def synth_npz_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweepdata")
    (root / "data").mkdir()
    np.savez_compressed(root / "data" / "synth.npz",
                        synth.make_synthetic(n_tr=96, n_ts=32, h=16, w=16,
                                             n_cls=10, seed=1))
    return str(root)


def test_vmap_sweep_final_write_and_resume(tmp_path, synth_npz_dir):
    """--vmap-sweep writes final state when n_iter is off the t_log grid,
    and --resume continues from the per-net checkpoints (code-review
    findings: both previously silently lost work)."""
    import numpy as np
    from mpnn_tpu.train import train_experiment
    from mpnn_tpu.utils.serdes import read_net

    out = str(tmp_path / "nets")
    train_experiment("synth-ac", n_iter=5, t_log=4, batch_size=8,
                     data_root=synth_npz_dir, out_root=out, verbose=False,
                     vmap_sweep=True)
    for i in range(8):
        _, _, _, extra = read_net(f"{out}/synth-ac/%.4i.npy" % i)
        assert int(extra["t"]) == 5   # final write happened
    # Resume: continue to 7 iters from the t=5 checkpoints.
    train_experiment("synth-ac", n_iter=7, t_log=4, batch_size=8,
                     data_root=synth_npz_dir, out_root=out, verbose=False,
                     vmap_sweep=True, resume=True)
    _, _, _, extra = read_net(f"{out}/synth-ac/0000.npy")
    assert int(extra["t"]) == 7


def test_serial_final_write_off_grid(tmp_path, synth_npz_dir):
    """The SERIAL driver also writes stats + checkpoint when n_iter is not
    a t_log multiple (code-review finding: short runs previously produced
    no stats files at all, breaking every figure CLI)."""
    from mpnn_tpu.train import train_experiment
    from mpnn_tpu.utils.serdes import read_net

    out = str(tmp_path / "nets")
    train_experiment("synth-ac", n_iter=5, t_log=4, batch_size=8,
                     net_indices=[0], data_root=synth_npz_dir,
                     out_root=out, verbose=False)
    d = np.load(f"{out}/synth-ac/0000-stats.npy", allow_pickle=True)[()]
    assert d["type"] == "ActorNet"
    _, _, _, extra = read_net(f"{out}/synth-ac/0000.npy")
    assert int(extra["t"]) == 5


def test_adaptive_checkpoint_resume(tmp_path, synth_npz_dir):
    """The adaptive driver checkpoints at every t_log boundary and resumes
    from net.npy (code-review finding: an 80k-iter adaptive run previously
    lost everything on a crash)."""
    from mpnn_tpu.train import train_adaptive_experiment
    from mpnn_tpu.utils.serdes import read_net

    out = str(tmp_path / "nets")
    train_adaptive_experiment("synth-ac-dynkcpt", n_iter=4, t_log=4,
                              batch_size=8, data_root=synth_npz_dir,
                              out_root=out, verbose=False)
    ckpt = f"{out}/synth-ac-dynkcpt/net.npy"
    _, _, _, extra = read_net(ckpt)
    assert int(extra["t"]) == 4
    # Resume: continue to 6 iters from the t=4 checkpoint.
    train_adaptive_experiment("synth-ac-dynkcpt", n_iter=6, t_log=4,
                              batch_size=8, data_root=synth_npz_dir,
                              out_root=out, verbose=False, resume=True)
    _, _, _, extra = read_net(ckpt)
    assert int(extra["t"]) == 6


def _leaf_desc(name="LogReg"):
    return {"name": name, "sinks": [],
            "stats_tr": {"p_cor": 0.5, "p_inc": 0.1},
            "stats_ts": {"p_cor": 0.5, "p_inc": 0.1}}


def _node_desc(sinks, name="ReConvMax"):
    return {"name": name, "sinks": sinks, "stats_tr": {}, "stats_ts": {}}


def test_nld_canvas_scales_with_topology(tmp_path):
    """Wide branching trees get wider canvases and wrap into grid rows;
    chains keep compact columns (hand-built descriptors, no training)."""
    from mpnn_tpu.viz import nld

    def tree(depth, fan):
        if depth == 0:
            return _leaf_desc()
        return _node_desc([_leaf_desc()] +
                          [tree(depth - 1, fan) for _ in range(fan)])

    chain = {"type": "ActorNet", "root": tree(4, 1),
             "stats_tr": {}, "stats_ts": {}}
    wide = {"type": "ActorNet", "root": tree(4, 2),
            "stats_tr": {}, "stats_ts": {}}
    wc, hc = nld._fig_dims(chain)
    ww, hw = nld._fig_dims(wide)
    assert ww > wc  # 2-way fanout tree is drawn wider than the chain

    # 8 wide trees wrap into multiple rows instead of one microscopic row.
    logs = {"t": [wide] * 8, "c": [chain] * 8}
    p = nld.render_experiment_grid(logs, "t", str(tmp_path / "t.pdf"))
    assert p and os.path.exists(p)
    p = nld.render_experiment_grid(logs, "c", str(tmp_path / "c.pdf"))
    assert p and os.path.exists(p)


def test_manifest_provenance(trained_dir):
    """Every experiment directory carries machine-readable dataset
    provenance (MANIFEST.json) so synthetic stand-ins are never mistaken
    for real-dataset results (VERDICT r1 weak #4)."""
    import json
    man = json.loads(
        (trained_dir / "nets" / "synth-ac" / "MANIFEST.json").read_text())
    assert man["provenance"]["synthetic"] is True
    assert man["dataset"].endswith("synth.npz")


def test_adaptive_stats_log_history(tmp_path):
    """stats_log=True writes per-k_cpt snapshot history at t_log
    boundaries, so make-videos works on adaptive runs (VERDICT r1 #9)."""
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    np.savez_compressed(data_dir / "synth.npz",
                        synth.make_synthetic(n_tr=96, n_ts=48, h=16, w=16,
                                             n_cls=10, seed=1))
    from mpnn_tpu.train import train_adaptive_experiment
    from mpnn_tpu import experiments as cfg
    train_adaptive_experiment("synth-ac-dynkcpt", n_iter=6, t_log=3,
                              batch_size=16, data_root=str(tmp_path),
                              out_root=str(tmp_path / "nets"),
                              verbose=False, stats_log=True)
    out = tmp_path / "nets" / "synth-ac-dynkcpt"
    for i in range(len(cfg.k_cpts)):
        snaps = sorted(glob(str(out / ("%.4i-stats" % i) / "*.npy")))
        assert [os.path.basename(p) for p in snaps] == [
            "00000003.npy", "00000006.npy"], i
    # make-videos machinery consumes the snapshot history.
    from mpnn_tpu.viz import loading, nld
    snaps = loading.load_snapshots(str(tmp_path / "nets"),
                                   "synth-ac-dynkcpt", 0)
    assert len(snaps) == 2
    frames = nld.render_video_frames(snaps, str(tmp_path / "vid"))
    assert len(frames) == 2


def test_vmap_sweep_with_mesh_full_driver(tmp_path, synth_npz_dir):
    """_train_sweep composed with a ('sweep','data') mesh (VERDICT r1 #5):
    the full driver path -- sharded training, vmapped sweep EVAL on
    sweep-sharded params, per-net stats/log/checkpoint writes -- runs on
    the virtual device mesh and produces the standard output contract."""
    import jax
    from mpnn_tpu.parallel import make_sweep_mesh
    from mpnn_tpu.train import train_experiment
    from mpnn_tpu.utils.serdes import read_net

    mesh = make_sweep_mesh(n_sweep=4, n_data=2)
    out = str(tmp_path / "nets")
    train_experiment("synth-ac", n_iter=4, t_log=4, batch_size=8,
                     data_root=synth_npz_dir, out_root=out, verbose=False,
                     vmap_sweep=True, mesh=mesh)
    for i in range(8):
        d = np.load(f"{out}/synth-ac/%.4i-stats.npy" % i,
                    allow_pickle=True)[()]
        assert d["type"] == "ActorNet"
        assert 0.0 <= d["stats_ts"]["acc"] <= 1.0
        _, _, _, extra = read_net(f"{out}/synth-ac/%.4i.npy" % i)
        assert int(extra["t"]) == 4


def test_vmap_sweep_mesh_axis_validation(synth_npz_dir):
    """A non-sweep mesh with --vmap-sweep fails loudly."""
    from mpnn_tpu.parallel import make_mesh
    from mpnn_tpu.train import train_experiment
    with pytest.raises(ValueError, match="sweep"):
        train_experiment("synth-ac", n_iter=2, t_log=2, batch_size=8,
                         data_root=synth_npz_dir, out_root="/tmp/unused",
                         verbose=False, vmap_sweep=True,
                         mesh=make_mesh(n_data=8, n_model=1))


def test_cls_labels_pad_past_ten():
    """Legend labels for >10-class descriptors pad with generic names
    instead of IndexError-ing (review finding, round 3)."""
    from mpnn_tpu.viz.nld import _cls_label_list, CLS_LABELS

    labels = _cls_label_list(13)
    assert len(labels) == 13
    assert labels[:10] == CLS_LABELS and labels[10:] == [
        "Class 10", "Class 11", "Class 12"]
    assert _cls_label_list(3) == CLS_LABELS[:3]
    assert _cls_label_list(2, ["a", "b"]) == ["a", "b"]
