"""Multi-chip sharding dry run on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import entry
    fn, args = entry()
    out, crc, mute = fn(*args)
    assert out.shape[1] == args[0].shape[0]
    assert not np.asarray(mute).any()
