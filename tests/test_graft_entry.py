"""The driver's integration points must stay healthy: entry() returns a
jittable forward on the flagship net, and dryrun_multichip(n) runs one full
sharded training step on an n-device mesh (the driver invokes it with a
virtual-CPU device count; see repo task contract)."""

import jax

import __graft_entry__ as graft


def test_entry_lowers_under_jit():
    fn, args = graft.entry()
    # Trace + lower (no backend compile: keeps the test fast while still
    # catching API drift, shape errors, and non-jittable control flow).
    lowered = jax.jit(fn).lower(*args)
    text = lowered.as_text()
    assert "func.func public @main" in text


def test_dryrun_multichip_two_devices():
    graft.dryrun_multichip(2)


def test_dryrun_multichip_driver_invocation():
    """Reproduce the driver's exact invocation: fresh process, NO conftest
    (so nothing pre-forces the CPU platform), axon plugin on the path, 8
    virtual CPU devices via XLA_FLAGS. Round 1 failed exactly here
    (MULTICHIP_r01.json rc=1): eager ops inside dryrun_multichip dispatched
    to the half-initialized axon TPU backend. dryrun_multichip must force
    the CPU platform before any backend touch."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # driver doesn't set it; axon ignores it
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"driver-style dryrun_multichip(8) failed:\n{proc.stderr[-4000:]}")
    assert "OK" in proc.stdout
    # The 8-device run must exercise the EXACT v5e-8 deployment
    # factorization: 8 sweep members one-per-chip (VERDICT r2 Weak #3).
    assert "{'sweep': 8, 'data': 1} 8-net step OK" in proc.stdout
