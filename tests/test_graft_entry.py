"""Driver-facing entry points must stay green (VERDICT round-1 gate #1).

dryrun_multichip re-execs in a subprocess that forces the virtual CPU mesh,
so it must succeed even when this process (or the env) is pointed at the
single-chip TPU tunnel.
"""
import os

import pytest


def test_dryrun_multichip_subprocess_forces_cpu_mesh():
    import __graft_entry__ as g

    # Simulate the hostile driver environment: axon preset in env.
    old = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "axon"
    try:
        g.dryrun_multichip(8)  # raises on failure
    finally:
        if old is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = old


def test_entry_compiles_single_device():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    assert compiled is not None
