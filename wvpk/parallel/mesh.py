"""Device mesh + lane sharding for batch decode."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.fused import fused_decode
from ..engine.staging import Bucket

LANE_AXIS = "blocks"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (LANE_AXIS,))


def _pad_lanes(arr: np.ndarray, L_pad: int) -> np.ndarray:
    if arr.shape[0] == L_pad:
        return arr
    pad = [(0, L_pad - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def shard_bucket_arrays(b: Bucket, mesh: Mesh) -> tuple[dict, int]:
    """Pad the lane axis to a mesh multiple and device_put every array with
    a lane-sharded NamedSharding."""
    n = mesh.devices.size
    L = b.words.shape[0]
    L_pad = ((L + n - 1) // n) * n
    sh = NamedSharding(mesh, P(LANE_AXIS))
    names = ["words", "nwords_lane", "nsamples", "med", "slow", "acc",
             "delta", "terms", "deltas16", "wa", "wb", "hist_a", "hist_b",
             "num_terms", "joint", "mute_limit", "shift", "bytes_stored",
             "float_shift_eff", "int32_zod"]
    out = {}
    for name in names:
        arr = _pad_lanes(np.asarray(getattr(b, name)), L_pad)
        out[name] = jax.device_put(arr, sh)
    return out, L


def sharded_decode_bucket(b: Bucket, mesh: Mesh):
    """Decode one bucket with the lane axis sharded across the mesh.

    shard_map runs the fused kernel per device on its lane shard — each
    device gets its own Pallas/XLA program (a Pallas custom call is opaque
    to the SPMD partitioner, so shard_map is the correct structure, not
    sharding propagation). Zero collectives on the hot path.
    Returns (out (T, L, C) int32, crc (L,), mute (L,)) unpadded.
    """
    from functools import partial

    from jax.experimental.shard_map import shard_map

    arrs, L = shard_bucket_arrays(b, mesh)
    prof = b.profile
    names = ["words", "nwords_lane", "nsamples", "med", "slow", "acc",
             "delta", "terms", "deltas16", "wa", "wb", "hist_a", "hist_b",
             "num_terms", "joint", "mute_limit", "shift", "bytes_stored",
             "float_shift_eff", "int32_zod"]
    args = [arrs[n] for n in names]
    lane = P(LANE_AXIS)
    in_specs = tuple(P(LANE_AXIS, *([None] * (a.ndim - 1))) for a in args)
    out_specs = (P(None, LANE_AXIS, None), P(LANE_AXIS), P(LANE_AXIS))

    fn = partial(fused_decode,
                 mono=prof.mono, hybrid=prof.hybrid,
                 hybrid_bitrate=prof.hybrid_bitrate,
                 hybrid_balance=prof.hybrid_balance,
                 is_float=prof.is_float,
                 int32_expand=prof.is_int32 and not prof.has_wvx,
                 nsteps=prof.nsteps,
                 num_terms_max=int(np.asarray(b.num_terms).max()))
    sharded = shard_map(fn, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_rep=False)
    out, crc, mute = jax.jit(sharded)(*args)
    return (np.asarray(out)[:, :L, :], np.asarray(crc)[:L],
            np.asarray(mute)[:L])
