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


def _oracle_check_bucket(b, mesh):
    from wvpk import consts
    from wvpk.parallel import sharded_decode_bucket
    from wvpk.ref import decode_block
    out, crc, mute, crc_x, crc_wvc = sharded_decode_bucket(b, mesh)
    for i, st in enumerate(b.states):
        want = decode_block(st)
        n = st.header.block_samples
        got = out[:n, i, :]
        if st.flags & consts.FALSE_STEREO:
            got = np.repeat(got, 2, axis=1)
        np.testing.assert_array_equal(got, want.samples, err_msg=f"lane {i}")
        assert int(crc[i]) == want.crc
        if b.profile.has_wvx:
            assert int(crc_x[i]) == want.crc_x
        if b.profile.has_wvc:
            assert int(crc_wvc[i]) == want.crc_wvc
        assert not mute[i]


def _buckets(data):
    from wvpk.container import parse_blocks
    from wvpk.engine.staging import group_blocks
    return group_blocks([blk.state for blk in parse_blocks(data)])


def test_sharded_wvx_uneven_lanes():
    """int32+wvx sharded across the mesh with lanes % devices != 0,
    incl. a FALSE_STEREO lane (the crc_x quirk, UnpackUtils.cs:1265)."""
    from wvpk.parallel import make_mesh
    from wvpk.testgen import EncodeSpec, encode_file
    rng = np.random.default_rng(21)
    mesh = make_mesh(8)
    stereo = np.clip(np.round(rng.normal(0, 1 << 24, (64 * 11, 2))),
                     -(1 << 30), 1 << 30).astype(np.int64)
    mono1 = np.clip(np.round(rng.normal(0, 1 << 22, (64 * 3, 1))),
                    -(1 << 30), 1 << 30).astype(np.int64)
    data = encode_file(stereo, EncodeSpec(
        block_samples=64, joint=True, bytes_stored=4, int32_mode="wvx",
        int32_sent_bits=4, int32_max_width=31))
    data += encode_file(mono1, EncodeSpec(
        block_samples=64, false_stereo=True, bytes_stored=4,
        int32_mode="wvx", int32_sent_bits=3))
    for b in _buckets(data):
        _oracle_check_bucket(b, mesh)


def test_sharded_hybrid_float_deep():
    from wvpk.parallel import make_mesh
    from wvpk.testgen import EncodeSpec, encode_file
    rng = np.random.default_rng(22)
    mesh = make_mesh(8)
    hyb = np.stack([np.round(rng.normal(0, 8000, 64 * 9)),
                    np.round(rng.normal(0, 90, 64 * 9))],
                   axis=1).astype(np.int64)
    flt = np.clip(np.round(rng.normal(0, 1 << 20, (64 * 10, 2))),
                  -(1 << 23) + 1, (1 << 23) - 1).astype(np.int64)
    deep = np.clip(np.round(rng.normal(0, 60000, (64 * 13, 2))),
                   -(1 << 23) + 1, (1 << 23) - 1).astype(np.int64)
    cases = [
        encode_file(hyb, EncodeSpec(
            block_samples=64, hybrid=True, hybrid_bitrate=True,
            hybrid_balance=True, bitrate=320, bitrate_delta=1)),
        encode_file(flt, EncodeSpec(
            block_samples=64, joint=True, float_data=True, bytes_stored=4,
            float_shift=0, float_max_exp=130, float_norm_exp=127)),
        encode_file(deep, EncodeSpec(
            block_samples=64, joint=True, bytes_stored=3,
            terms=(18, 18, 17, 17, 3, 2, 5, 1, 2, 18, 17, 2),
            deltas=(2,) * 12)),
    ]
    for data in cases:
        for b in _buckets(data):
            _oracle_check_bucket(b, mesh)


def test_sharded_dsd_modes():
    """DSD modes 1 and 3 lane-sharded over the mesh via shard_lanes_call,
    bit-exact vs the oracle (uneven lane counts)."""
    from wvpk.container import parse_blocks
    from wvpk.engine.dsd_pipeline import (finalize_dsd_group,
                                          launch_dsd_states)
    from wvpk.parallel import make_mesh
    from wvpk.ref import decode_block
    from wvpk.testgen import encode_dsd_file
    rng = np.random.default_rng(23)
    mesh = make_mesh(8)
    for mode in (1, 3):
        d = rng.integers(0, 256, (64 * 11, 2)).astype(np.int64)
        data = encode_dsd_file(d, mode, mono=False, history_bits=2)
        states = [blk.state for blk in parse_blocks(data)]
        n_checked = 0
        for ld in launch_dsd_states(states, mesh=mesh):
            for i, res in zip(ld.idxs, finalize_dsd_group(ld)):
                want = decode_block(states[i])
                np.testing.assert_array_equal(res.samples, want.samples)
                assert not res.crc_error
                n_checked += 1
        assert n_checked == len(states)


def test_sharded_decode_states_matches_single_chip():
    """sharded_decode_states over the 8-device mesh returns block-for-block
    identical results to the single-chip engine on a mixed PCM+DSD+
    zero-sample corpus."""
    from wvpk.container import parse_blocks
    from wvpk.engine import decode_states
    from wvpk.parallel import make_mesh, sharded_decode_states
    from wvpk.testgen import EncodeSpec, encode_dsd_file, encode_file
    rng = np.random.default_rng(24)
    mesh = make_mesh(8)
    data = encode_file(
        np.round(rng.normal(0, 3000, (64 * 10, 2))).astype(np.int64),
        EncodeSpec(block_samples=64, joint=True))
    data += encode_file(
        np.round(rng.normal(0, 700, (64 * 3, 1))).astype(np.int64),
        EncodeSpec(block_samples=64, mono=True, terms=(17, 2),
                   deltas=(2, 2)))
    data += encode_file(
        np.stack([np.round(rng.normal(0, 8000, 64 * 4)),
                  np.round(rng.normal(0, 90, 64 * 4))],
                 axis=1).astype(np.int64),
        EncodeSpec(block_samples=64, hybrid=True, hybrid_bitrate=True,
                   hybrid_balance=True, bitrate=320, bitrate_delta=1))
    data += encode_file(
        np.clip(np.round(rng.normal(0, 1 << 20, (64 * 4, 2))),
                -(1 << 23) + 1, (1 << 23) - 1).astype(np.int64),
        EncodeSpec(block_samples=64, joint=True, float_data=True,
                   bytes_stored=4, float_shift=0, float_max_exp=130,
                   float_norm_exp=127))
    data += encode_dsd_file(
        rng.integers(0, 256, (64 * 5, 2)).astype(np.int64), 3, mono=False)
    states = [blk.state for blk in parse_blocks(data)]
    single = decode_states(states)
    multi = sharded_decode_states(states, mesh)
    assert len(single) == len(multi)
    for s, m in zip(single, multi):
        np.testing.assert_array_equal(s.samples, m.samples)
        assert s.crc == m.crc
        assert s.mute_error == m.mute_error
        assert s.crc_error == m.crc_error


def test_sharded_device_encode():
    """Device ENCODE lane-sharded over the mesh: identical blocks to the
    unsharded path (and therefore oracle-exact), uneven lane count."""
    from wvpk.encode import build_spec
    from wvpk.engine.device_encoder import encode_blocks_device
    from wvpk.parallel import make_mesh

    rng = np.random.default_rng(7)
    t = np.arange(11 * 300)          # 11 blocks: 11 % 8 != 0
    s = 4000 * np.sin(2 * np.pi * t / 83.0)
    pcm = np.round(np.stack([s, s * 0.6], 1)
                   + rng.normal(0, 100, (t.size, 2))).astype(np.int64)
    spec = build_spec(pcm, block_samples=300)
    mesh = make_mesh(8)
    sharded = encode_blocks_device(pcm, spec, mesh=mesh)
    plain = encode_blocks_device(pcm, spec)
    assert sharded == plain


def test_sharded_device_encode_wvx():
    """Wide-32-bit device encode (wvx sent-bits sidecar) sharded over
    the mesh: byte-identical to unsharded, and the stream decodes
    sample-exact with the crc_mvx stamp verifying."""
    from wvpk.container import parse_blocks
    from wvpk.encode import build_spec
    from wvpk.engine import decode_states
    from wvpk.engine.device_encoder import encode_blocks_device
    from wvpk.parallel import make_mesh

    rng = np.random.default_rng(17)
    pcm = (rng.integers(-(1 << 30), 1 << 30, (5 * 300, 2)) | 1) \
        .astype(np.int64)
    spec = build_spec(pcm, bytes_per_sample=4, block_samples=300)
    assert spec.int32_mode == "wvx"
    mesh = make_mesh(8)
    sharded = encode_blocks_device(pcm, spec, mesh=mesh)
    assert sharded == encode_blocks_device(pcm, spec)
    res = decode_states([b.state for b in
                         parse_blocks(b"".join(sharded))])
    assert not any(r.crc_error or r.mute_error for r in res)
    np.testing.assert_array_equal(
        np.concatenate([r.samples for r in res]), pcm)


def test_public_encode_device_mesh():
    """Public encode_device(mesh=...): block-identical to unsharded
    fresh-seeded, for stereo AND a >2ch segment."""
    from wvpk.encode import encode_device
    from wvpk.parallel import make_mesh

    rng = np.random.default_rng(13)
    mesh = make_mesh(8)
    for ch in (2, 5):
        t = np.arange(9 * 200)[:, None]
        pcm = np.round(3000 * np.sin(2 * np.pi * t / 71.0)
                       + rng.normal(0, 90, (t.size, ch))).astype(np.int64)
        sharded = encode_device(pcm, block_samples=200, mesh=mesh,
                                warmup=0)
        assert sharded == encode_device(pcm, block_samples=200, warmup=0)


def test_sharded_device_encode_hybrid():
    """The fused HYBRID encode scan lane-sharded over the mesh: identical
    blocks to the unsharded scan, and the stream decodes clean (mute/CRC
    free) on the single-chip decoder. Uneven lane count (5 % 8 != 0)."""
    from wvpk.container import parse_blocks
    from wvpk.encode import build_spec
    from wvpk.engine.device_encoder import encode_blocks_device
    from wvpk.ref import decode_block
    from wvpk.parallel import make_mesh

    rng = np.random.default_rng(11)
    t = np.arange(5 * 256)
    s = 6000 * np.sin(2 * np.pi * t / 61.0)
    pcm = np.round(np.stack([s, s * 0.7], 1)
                   + rng.normal(0, 300, (t.size, 2))).astype(np.int64)
    spec = build_spec(pcm, block_samples=256, hybrid=True, bitrate=384)
    mesh = make_mesh(8)
    sharded = encode_blocks_device(pcm, spec, mesh=mesh)
    assert sharded == encode_blocks_device(pcm, spec)
    outs = [decode_block(blk.state)
            for blk in parse_blocks(b"".join(sharded))]
    assert not any(r.crc_error or r.mute_error for r in outs)
    dec = np.concatenate([r.samples for r in outs])
    # lossy: bounded error, not identity
    assert np.abs(dec - pcm).max() < (1 << 12)


def test_sharded_device_encode_warmup():
    """Warm seeding under a mesh: the lookahead adaptation scan shards
    lane-parallel (sharded_invert_warm_state), so mesh output is
    block-identical to the unsharded warm path for lossless AND hybrid,
    and the warm stream stays oracle-decodable. Uneven lane counts."""
    from wvpk.container import parse_blocks
    from wvpk.encode import build_spec, encode_device
    from wvpk.engine.device_encoder import encode_blocks_device
    from wvpk.parallel import make_mesh
    from wvpk.ref import decode_block

    rng = np.random.default_rng(23)
    mesh = make_mesh(8)
    t = np.arange(7 * 300)
    s = 5000 * np.sin(2 * np.pi * t / 97.0)
    pcm = np.round(np.stack([s, s * 0.5], 1)
                   + rng.normal(0, 200, (t.size, 2))).astype(np.int64)

    spec = build_spec(pcm, block_samples=300)
    sharded = encode_blocks_device(pcm, spec, mesh=mesh, warmup=512)
    assert sharded == encode_blocks_device(pcm, spec, warmup=512)
    outs = [decode_block(blk.state)
            for blk in parse_blocks(b"".join(sharded))]
    assert not any(r.crc_error or r.mute_error for r in outs)
    assert np.array_equal(np.concatenate([r.samples for r in outs]), pcm)

    hspec = build_spec(pcm, block_samples=300, hybrid=True, bitrate=384)
    hsharded = encode_blocks_device(pcm, hspec, mesh=mesh, warmup=512)
    assert hsharded == encode_blocks_device(pcm, hspec, warmup=512)

    # public API: default warmup now rides the mesh too (>2ch segment)
    pcm5 = np.round(3000 * np.sin(2 * np.pi * np.arange(3 * 200) / 71.0)
                    [:, None] + rng.normal(0, 90, (600, 5))).astype(np.int64)
    assert encode_device(pcm5, block_samples=200, mesh=mesh) \
        == encode_device(pcm5, block_samples=200)
