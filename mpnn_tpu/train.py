"""Experiment training drivers.

Reproduces the observable behavior of the reference CLIs:

- `train_experiment` == scripts/train-nets:132-164: per net in the
  experiment, train n_iter steps, every t_log steps evaluate both splits and
  save `nets/<expt>/<i>-stats/<t>.npy` + `nets/<expt>/<i>-stats.npy` +
  append the rendered text tree to `nets/<expt>/<i>-log.txt`; finally
  `write_net('nets/<expt>/<i>.npy')`.
- `train_adaptive_experiment` == scripts/train-adaptive-nets:89-107: one net
  with per-example k_cpt sampled per batch; after training, one stats file
  per k_cpt value (so downstream plots see an 8-net sweep) + `net.npy`.

TPU-native differences: the hot loop calls one donated jitted step (no
feeds); evaluation is a jitted lax.scan per split; checkpoints additionally
carry momentum + step for resume. n_iter / t_log / batch_size are
parameterizable for smoke runs but default to the reference's values."""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from . import experiments as cfg
from .data import Dataset
from .models.steps import Schedules, make_train_step, make_train_loop, \
    make_eval_split_fn, init_training, make_sweep_train_loop, \
    make_sweep_eval_split_fn, stack_trees, unstack_tree
from .utils.desc import net_desc, render_net_desc, sweep_net_descs
from .utils.serdes import write_net, atomic_save

__all__ = ["train_one_net", "train_experiment", "train_adaptive_experiment"]


def _is_writer():
    """Single-writer gating for multi-process (multi-host DCN) runs: only
    process 0 touches stats/log/checkpoint files (SURVEY.md section 2.2;
    mpnn_tpu.parallel.multihost). Trivially True single-process."""
    return jax.process_index() == 0


def _globalize(mesh, tree):
    """Make per-process arrays (init outputs, PRNG keys) valid inputs to a
    jit spanning a multi-process mesh: globally-replicated jax.Arrays.
    No-op single-process."""
    if mesh is None or jax.process_count() == 1:
        return tree
    from .parallel.multihost import replicate_to_global
    return replicate_to_global(mesh, jax.device_get(tree))


def _write_manifest(out_dir, dataset):
    """nets/<expt>/MANIFEST.json: machine-readable dataset provenance so a
    directory named after a real dataset can never silently hold synthetic
    stand-in results (VERDICT r1 weak #4). Written by every experiment
    driver before any stats file. Multi-process: primary-only."""
    if not _is_writer():
        return
    os.makedirs(out_dir, exist_ok=True)
    prov = dataset.provenance
    if prov is None:
        prov = {"synthetic": None,
                "note": "archive carries no provenance record"}
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump({"dataset": dataset.path, "provenance": prov}, f,
                  indent=2, default=str)
        f.write("\n")


def _fresh_log(out_dir, i):
    """Remove a member's rendered log before a NON-resumed run: stats are
    overwritten but the log is opened append-mode, so fresh retrains
    (e.g. after a VM reboot loses checkpoints) used to accumulate
    bitwise-identical concatenated trajectories (ADVICE r3). Resumed runs
    keep appending, preserving the single continuous trajectory."""
    if not _is_writer():
        return
    path = os.path.join(out_dir, "%.4i-log.txt" % i)
    if os.path.exists(path):
        os.remove(path)


def _tau_at(tau_fn, t, net):
    if tau_fn is None:
        return float(getattr(net.hypers, "τ", 1.0))
    return float(tau_fn(t))


def _write_epoch_outputs(out_dir, i, t, desc, net, params, state, vel, *,
                         save_snapshots=True, verbose=True):
    """The per-t_log on-disk contract, shared by the serial and sweep
    paths: `%.4i-stats/%.8i.npy` snapshot, `%.4i-stats.npy` latest,
    rendered tree appended to `%.4i-log.txt`, `%.4i.npy` checkpoint with
    optimizer state + step (reference scripts/train-nets:144-157, plus the
    resume extension). Multi-process: primary-only (single writer)."""
    if not _is_writer():
        return
    text = render_net_desc(desc, "%s/%.4i.npy — Epoch %i" % (out_dir, i, t))
    os.makedirs(out_dir, exist_ok=True)
    if save_snapshots:
        snap_dir = os.path.join(out_dir, "%.4i-stats" % i)
        os.makedirs(snap_dir, exist_ok=True)
        atomic_save(os.path.join(snap_dir, "%.8i.npy" % t), desc)
    atomic_save(os.path.join(out_dir, "%.4i-stats.npy" % i), desc)
    with open(os.path.join(out_dir, "%.4i-log.txt" % i), "a+") as f:
        f.write(text + "\n")
    write_net(os.path.join(out_dir, "%.4i.npy" % i), net, params, state,
              extra={"vel": vel, "t": t})
    if verbose:
        print(text)


def train_one_net(net, dataset, *, schedules, tau_fn, n_iter, t_log,
                  batch_size, out_dir=None, net_index=0, seed=0,
                  eval_batch_size=None, k_cpt_eval=None, verbose=True,
                  save_snapshots=True, resume=False, profile_dir=None,
                  mesh=None):
    """Train a single net; returns (params, state, vel, final_desc).

    Checkpoints are written at every t_log boundary (SURVEY.md section 5:
    the eval cadence doubles as the resume point -- the reference only
    checkpoints once at the end, scripts/train-nets:157, losing mid-run
    crashes). With resume=True, training continues from the saved step.
    profile_dir captures a jax.profiler trace of a few hot-loop steps."""
    eval_batch_size = eval_batch_size or batch_size
    t_start = 0
    params = None
    ckpt_path = (os.path.join(out_dir, "%.4i.npy" % net_index)
                 if out_dir is not None else None)
    if resume and ckpt_path is not None and os.path.exists(ckpt_path):
        from .utils.serdes import read_net
        _, params, state, extra = read_net(ckpt_path)
        if extra is not None and "vel" in extra:
            vel, t_start = extra["vel"], int(extra["t"])
            if verbose:
                print("  [resuming %s at t=%i]" % (ckpt_path, t_start))
        else:
            params = None
    if params is None:
        params, state, vel = init_training(net, seed)
        if out_dir is not None:
            _fresh_log(out_dir, net_index)
    # Multi-process mesh: training state and the PRNG key become globally
    # replicated arrays (per-process committed arrays are rejected by a jit
    # spanning processes); the dataset stages globally too.
    if mesh is not None and jax.process_count() > 1:
        # Resume probes the checkpoint per-process: on a non-shared
        # filesystem some processes can find it while others init fresh,
        # which would replicate DIVERGENT "identical" state and desync the
        # collective loop (a hang at best, silent corruption at worst).
        # Cross-check a fingerprint before globalizing and fail loud.
        from jax.experimental import multihost_utils
        fp = np.asarray(
            [float(t_start)]
            + [np.float64(np.sum(np.abs(np.asarray(l, np.float64))))
               for l in jax.tree.leaves(params)[:4]], np.float64)
        fps = np.asarray(multihost_utils.process_allgather(fp))
        if not np.allclose(fps, fps[0]):
            raise RuntimeError(
                "multi-host resume desync: processes disagree on "
                "(t_start, param fingerprint) %r -- the checkpoint %r must "
                "be visible to EVERY process (shared filesystem or "
                "pre-replicated nets/ dir)" % (fps.tolist(), ckpt_path))
        dataset.set_global_mesh(mesh)
        params, state, vel = _globalize(mesh, (params, state, vel))
    loop = make_train_loop(net, batch_size, schedules, mesh=mesh)
    # Pass the static k_cpt as a traced scalar so every net of a k_cpt
    # sweep reuses one compiled program (sweeps differ only in this value).
    multiproc = mesh is not None and jax.process_count() > 1
    # Host scalar under multi-process (auto-replicated by jit); a committed
    # device scalar otherwise (keeps the single-process compile-cache key).
    k_scalar = np.float32 if multiproc else jnp.float32
    k_cpt_traced = (None if schedules.k_cpt_sample is not None
                    else k_scalar(getattr(net.hypers, "k_cpt", 0.0)))
    eval_split = make_eval_split_fn(net, eval_batch_size, mesh=mesh)
    x0_tr, y_tr, m_sym = dataset.train_arrays
    rng = _globalize(mesh, jax.random.PRNGKey(seed + 1))
    desc = None

    if profile_dir is not None:
        # Capture a short scanned chunk (after a warmup compile+run).
        params, state, vel, _ = loop(params, state, vel, t_start, rng,
                                     x0_tr, y_tr, m_sym, 2, k_cpt_traced)
        jax.block_until_ready(params)
        t_start += 2
        jax.profiler.start_trace(profile_dir)
        params, state, vel, _ = loop(params, state, vel, t_start, rng,
                                     x0_tr, y_tr, m_sym, 8, k_cpt_traced)
        jax.block_until_ready(params)
        jax.profiler.stop_trace()
        t_start += 8
        if verbose:
            print("  [profiler trace written to %s]" % profile_dir)

    t0 = time.time()
    t = t_start
    last_written = t_start if t_start else -1

    def eval_and_write(t):
        desc = net_desc(net, dataset, params, state,
                        batch_size=eval_batch_size,
                        tau=_tau_at(tau_fn, t - 1, net),
                        k_cpt=k_cpt_eval, eval_split=eval_split,
                        eval_key=_globalize(mesh, jax.random.fold_in(
                            jax.random.PRNGKey(seed + 2), t)))
        if out_dir is not None:
            # Periodic checkpoint: the eval cadence doubles as the
            # resume point (SURVEY.md section 5).
            _write_epoch_outputs(out_dir, net_index, t, desc, net,
                                 params, state, vel,
                                 save_snapshots=save_snapshots,
                                 verbose=verbose)
        return desc

    while t < n_iter:
        # One scanned chunk per t_log span: the whole span is a single
        # device call (no host round-trips inside).
        n_chunk = min(t_log - (t % t_log), n_iter - t)
        params, state, vel, cs = loop(params, state, vel, t, rng,
                                      x0_tr, y_tr, m_sym, n_chunk,
                                      k_cpt_traced)
        t += n_chunk
        if verbose:
            print("  --- Iteration %i ---\r" % t, end="", flush=True)
        if t % t_log == 0:
            desc = eval_and_write(t)
            last_written = t
    if last_written != n_iter:
        # n_iter not on a t_log boundary (or a no-eval short run): still
        # evaluate and persist the final state, like the sweep path and the
        # reference's end-of-training write (scripts/train-nets:144-157).
        desc = eval_and_write(n_iter)
    if verbose:
        dt = time.time() - t0
        n_run = n_iter - t_start
        print("\n  [%i iters in %.1fs — %.0f img/s]"
              % (n_run, dt, n_run * batch_size / max(dt, 1e-9)))
    return params, state, vel, desc


def train_experiment(expt_name, *, n_iter=None, t_log=None, batch_size=None,
                     net_indices=None, data_root=".", out_root="nets",
                     seed=0, verbose=True, resume=False, profile_dir=None,
                     mesh=None, vmap_sweep=False):
    """Train every net of a registry experiment
    (reference scripts/train-nets:159-164).

    With vmap_sweep=True and a k_cpt-sweep experiment (same architecture
    per net), all nets train SIMULTANEOUSLY in one vmapped program --
    near-sweep-width throughput on the op-dispatch-bound b128 step -- while
    writing the same per-net stats/log/checkpoint files as serial runs."""
    expt = cfg.make_experiments()[expt_name]
    dataset = Dataset(os.path.join(data_root, expt.dataset))
    n_iter = n_iter or cfg.n_iter
    t_log = t_log or cfg.t_log
    batch_size = batch_size or cfg.batch_size
    out_dir = os.path.join(out_root, expt_name)
    indices = net_indices if net_indices is not None \
        else range(len(expt.nets))

    if vmap_sweep and getattr(expt, "sweep_k_cpts", None) is not None \
            and net_indices is None:
        if profile_dir is not None:
            raise ValueError(
                "--vmap-sweep does not support profile_dir; run serially")
        if mesh is not None and "sweep" not in mesh.axis_names:
            raise ValueError(
                "--vmap-sweep needs a ('sweep', 'data') mesh "
                "(parallel.make_sweep_mesh), got axes %r"
                % (mesh.axis_names,))
        _write_manifest(out_dir, dataset)
        return _train_sweep(expt, expt_name, dataset, n_iter=n_iter,
                            t_log=t_log, batch_size=batch_size,
                            out_dir=out_dir, seed=seed, verbose=verbose,
                            resume=resume, mesh=mesh)

    _write_manifest(out_dir, dataset)
    for i in indices:
        net = expt.nets[i](dataset.x0_shape, dataset.y_shape)
        schedules = Schedules(lr=cfg.λ_lrn, tau=expt.tau)
        # train_one_net writes stats + the final checkpoint itself (at every
        # t_log boundary and once more at n_iter if that is not a boundary).
        train_one_net(
            net, dataset, schedules=schedules, tau_fn=expt.tau,
            n_iter=n_iter, t_log=t_log, batch_size=batch_size,
            out_dir=out_dir, net_index=i, seed=seed + i, verbose=verbose,
            resume=resume, profile_dir=profile_dir, mesh=mesh)


def _train_sweep(expt, expt_name, dataset, *, n_iter, t_log, batch_size,
                 out_dir, seed, verbose, resume=False, mesh=None):
    """Joint vmapped training of a k_cpt sweep; same on-disk outputs as the
    serial path (stats snapshots + latest, rendered logs, checkpoints),
    including a final write at t=n_iter when it is not a t_log boundary,
    and resume from the per-net periodic checkpoints.

    With a ('sweep', 'data') mesh, each net's whole training state lives on
    one 'sweep' shard (the v5e-8 deployment shape: 8 nets on 8 chips, zero
    cross-net collectives); a data axis >1 additionally splits each batch."""
    k_cpts = np.asarray(expt.sweep_k_cpts, np.float32)
    n_nets = len(k_cpts)
    if mesh is not None and jax.process_count() > 1:
        raise NotImplementedError(
            "vmap-sweep training over a multi-PROCESS mesh is not "
            "supported: per-net checkpoint writes would need an all-gather "
            "of 'sweep'-sharded state to the primary. Run the sweep "
            "single-process (one host drives the whole slice) or train "
            "data-parallel multi-host without --vmap-sweep.")
    if mesh is not None and n_nets % mesh.shape["sweep"] != 0:
        raise ValueError(
            "sweep of %d nets does not tile the %d-way 'sweep' mesh axis"
            % (n_nets, mesh.shape["sweep"]))
    net = expt.nets[0](dataset.x0_shape, dataset.y_shape)  # shared arch
    schedules = Schedules(lr=cfg.λ_lrn, tau=expt.tau)
    loop = make_sweep_train_loop(net, batch_size, schedules, mesh=mesh)
    eval_split = make_sweep_eval_split_fn(net, batch_size)
    x0_tr, y_tr, m_sym = dataset.train_arrays
    rng = jax.random.PRNGKey(seed + 1)

    t_start = 0
    members = None
    if resume:
        from .utils.serdes import read_net
        paths = [os.path.join(out_dir, "%.4i.npy" % i)
                 for i in range(n_nets)]
        if all(os.path.exists(p) for p in paths):
            loaded = [read_net(p) for p in paths]
            extras = [ex for _, _, _, ex in loaded]
            # Resume only if EVERY member checkpoint carries optimizer
            # state and they all agree on the step (a reference-schema
            # checkpoint without `extra` cannot seed the sweep).
            if all(ex is not None and "vel" in ex and "t" in ex
                   for ex in extras):
                ts = {int(ex["t"]) for ex in extras}
                if len(ts) == 1:
                    t_start = ts.pop()
                    members = [(p, s, ex["vel"]) for _, p, s, ex in loaded]
                    if verbose:
                        print("  [resuming %s sweep at t=%i]"
                              % (expt_name, t_start))
    if members is None:
        members = [init_training(net, seed + i) for i in range(n_nets)]
        for i in range(n_nets):
            _fresh_log(out_dir, i)
    params_s = stack_trees([m[0] for m in members])
    state_s = stack_trees([m[1] for m in members])
    vel_s = stack_trees([m[2] for m in members])
    if mesh is not None:
        from .parallel import shard_sweep_tree
        params_s = shard_sweep_tree(params_s, mesh)
        state_s = shard_sweep_tree(state_s, mesh)
        vel_s = shard_sweep_tree(vel_s, mesh)
    k_arr = jnp.asarray(k_cpts)

    def write_all(t):
        tau_t = _tau_at(expt.tau, t - 1, net)
        descs = sweep_net_descs(net, dataset, params_s, state_s, k_cpts,
                                batch_size=batch_size, tau=tau_t,
                                eval_split=eval_split,
                                eval_key=jax.random.fold_in(
                                    jax.random.PRNGKey(seed + 2), t))
        # ONE overlapped device->host pull of the stacked trees; per-net
        # unstacking is then numpy views (per-net on-device slicing +
        # per-leaf pulls cost ~2 ms dispatch x thousands of leaves through
        # the tunneled runtime and dominated the epoch).
        host_p, host_s, host_v = jax.device_get((params_s, state_s, vel_s))
        for i in range(n_nets):
            _write_epoch_outputs(out_dir, i, t, descs[i], net,
                                 unstack_tree(host_p, i),
                                 unstack_tree(host_s, i),
                                 unstack_tree(host_v, i), verbose=verbose)

    os.makedirs(out_dir, exist_ok=True)
    t0_wall = time.time()
    t = t_start
    last_written = t_start if t_start else -1
    while t < n_iter:
        n_chunk = min(t_log - (t % t_log), n_iter - t)
        params_s, state_s, vel_s, cs = loop(params_s, state_s, vel_s, t,
                                            rng, x0_tr, y_tr, m_sym,
                                            n_chunk, k_arr)
        t += n_chunk
        if verbose:
            print("  --- Iteration %i (sweep of %i) ---\r" % (t, n_nets),
                  end="", flush=True)
        if t % t_log == 0:
            write_all(t)
            last_written = t
    if last_written != n_iter:
        # n_iter not on a t_log boundary (or a no-eval short run): still
        # persist the final state, as the serial path does
        # (reference scripts/train-nets:157).
        write_all(n_iter)
    if verbose:
        dt = time.time() - t0_wall
        n_run = n_iter - t_start
        print("\n  [sweep of %i nets x %i iters in %.1fs — %.0f img/s "
              "aggregate]" % (n_nets, n_run, dt,
                              n_nets * n_run * batch_size / max(dt, 1e-9)))


def train_adaptive_experiment(expt_name, *, n_iter=None, batch_size=None,
                              t_log=None, data_root=".", out_root="nets",
                              seed=0, verbose=True, resume=False,
                              stats_log=False):
    """Train one adaptive (dyn_k_cpt) net, then evaluate it once per k_cpt
    value writing one stats file each
    (reference scripts/train-adaptive-nets:89-107).

    Like the reference, no mid-run evals by default -- but the net.npy
    checkpoint IS written at every t_log boundary (with optimizer state +
    step) so a crashed 80k-iter run resumes instead of restarting
    (SURVEY.md section 5; the reference only writes once, at the very
    end). With stats_log=True, every t_log boundary ALSO writes the
    per-k_cpt descriptor snapshots `%.4i-stats/%.8i.npy` (+ latest), so
    resumed/crashed runs keep a routing-evolution record and make-videos
    works on adaptive runs; off by default for reference parity."""
    expt = cfg.make_adaptive_experiments()[expt_name]
    dataset = Dataset(os.path.join(data_root, expt.dataset))
    n_iter = n_iter or cfg.n_iter
    batch_size = batch_size or cfg.batch_size
    out_dir = os.path.join(out_root, expt_name)
    _write_manifest(out_dir, dataset)
    ckpt_path = os.path.join(out_dir, "net.npy")

    net = expt.net(dataset.x0_shape, dataset.y_shape)
    schedules = Schedules(lr=cfg.λ_lrn, tau=expt.tau,
                          k_cpt_sample=cfg.k_cpts)
    params = None
    t_start = 0
    if resume and os.path.exists(ckpt_path):
        from .utils.serdes import read_net
        _, params, state, extra = read_net(ckpt_path)
        if extra is not None and "vel" in extra and "t" in extra:
            vel, t_start = extra["vel"], int(extra["t"])
            if verbose:
                print("  [resuming %s at t=%i]" % (ckpt_path, t_start))
        else:
            params = None
    if params is None:
        params, state, vel = init_training(net, seed)
    loop = make_train_loop(net, batch_size, schedules)
    eval_split = make_eval_split_fn(net, batch_size)
    x0_tr, y_tr, m_sym = dataset.train_arrays
    rng = jax.random.PRNGKey(seed + 1)
    os.makedirs(out_dir, exist_ok=True)

    def write_stats(t, latest_only=False):
        """Per-k_cpt descriptors at step t: `%.4i-stats.npy` latest (the
        reference's 8-files-as-a-sweep contract, train-adaptive-nets:
        101-105) and, unless latest_only, `%.4i-stats/%.8i.npy` history
        snapshots for make-videos."""
        if not _is_writer():
            return
        tau_t = _tau_at(expt.tau, t - 1, net)
        for i, k_cpt in enumerate(cfg.k_cpts):
            desc = net_desc(net, dataset, params, state,
                            batch_size=batch_size, tau=tau_t, k_cpt=k_cpt,
                            eval_split=eval_split,
                            eval_key=jax.random.fold_in(
                                jax.random.PRNGKey(seed + 2), t))
            if not latest_only:
                snap_dir = os.path.join(out_dir, "%.4i-stats" % i)
                os.makedirs(snap_dir, exist_ok=True)
                atomic_save(os.path.join(snap_dir, "%.8i.npy" % t), desc)
            atomic_save(os.path.join(out_dir, "%.4i-stats.npy" % i), desc)

    chunk = min(n_iter, t_log or cfg.t_log)
    t = t_start
    while t < n_iter:
        n_chunk = min(chunk - (t % chunk), n_iter - t)
        params, state, vel, _ = loop(params, state, vel, t, rng,
                                     x0_tr, y_tr, m_sym, n_chunk)
        t += n_chunk
        if verbose:
            print("  --- Iteration %i ---\r" % t, end="", flush=True)
        if t < n_iter and _is_writer():
            write_net(ckpt_path, net, params, state,
                      extra={"vel": vel, "t": t})
            if stats_log:
                write_stats(t)
    # Persist the final params BEFORE the 8-eval sweep: a crash during the
    # evals then resumes here instead of retraining the last chunk.
    if _is_writer():
        write_net(os.path.join(out_dir, "net.npy"), net, params, state,
                  extra={"vel": vel, "t": n_iter})
    write_stats(n_iter, latest_only=not stats_log)
    if verbose:
        print()
