"""Debug / sanitizer mode (SURVEY.md section 5.2).

JAX's functional model makes the pipeline race-free by construction (the
reference's one unsafe pattern — shared read_buffer reuse,
MetadataUtils.cs:86 — has no analog here). The sanitizers that DO apply:

- `checkify_smoke()`: runs a representative kernel under
  jax.experimental.checkify with index/NaN checks enabled;
- `oracle_checked_decode()`: cross-checks every device-decoded block
  against the scalar oracle (the strictest strict-dtype/wraparound test);
- `set_options(oracle_check=True)` wires the same check into every decode.
"""

from __future__ import annotations

import numpy as np


def oracle_checked_decode(states):
    """Device-decode with per-block oracle equality assertion."""
    from .engine import decode_states
    from .ref import decode_block

    results = decode_states(states)
    for st, res in zip(states, results):
        want = decode_block(st)
        if not np.array_equal(want.samples, res.samples):
            raise AssertionError(
                f"device/oracle mismatch at block {st.header.block_index}")
        if (want.mute_error, want.crc_error) != (res.mute_error, res.crc_error):
            raise AssertionError(
                f"status mismatch at block {st.header.block_index}")
    return results


def checkify_smoke():
    """Run the decorr kernel under checkify (bounds + NaN checks)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify

    from .ops.decorr import decorr_decode

    L, T = 4, 32
    residuals = jnp.zeros((T, L, 2), jnp.int32)
    terms = jnp.full((L, 16), 18, jnp.int32)
    deltas = jnp.full((L, 16), 2, jnp.int32)
    w = jnp.zeros((L, 16), jnp.int32)
    h = jnp.zeros((L, 16, 8), jnp.int64)
    nt = jnp.full((L,), 2, jnp.int32)

    def run(res):
        return decorr_decode(res, terms, deltas, w, w, h, h, nt, mono=False)

    checked = checkify.checkify(run, errors=checkify.index_checks)
    err, out = checked(residuals)
    err.throw()
    return np.asarray(out)
