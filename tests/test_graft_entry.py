"""Driver-contract tests: entry() compiles, dryrun_multichip runs on the
virtual 8-device CPU mesh."""

import importlib.util
import os

import jax
import pytest


def _load_graft_entry():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_jits():
    mod = _load_graft_entry()
    fn, args = mod.entry()
    loss = jax.jit(fn)(*args)
    assert float(loss) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    mod = _load_graft_entry()
    mod.dryrun_multichip(8)
