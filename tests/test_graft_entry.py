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
