"""Bounded-memory streaming decode (api streaming mode + caches).

Reference analog: the BinaryReader incremental-refill decode path
(BitsUtils.cs:95-146, MetadataUtils.cs:25-26) holds O(block) memory; the
streaming open must match that asymptotically — header index eager,
payloads lazy behind an LRU, decoded segments evicted at a cap."""

import numpy as np
import pytest

from wvpk import api, config
from wvpk.container.stream import scan_headers_file
from wvpk.testgen import EncodeSpec, encode_file


def make_file(tmp_path, n_blocks=24, block_samples=256, seed=3):
    rng = np.random.default_rng(seed)
    n = n_blocks * block_samples
    pcm = np.round(rng.normal(0, 3000, (n, 2))).astype(np.int64)
    np.clip(pcm, -32768, 32767, out=pcm)
    data = encode_file(pcm, EncodeSpec(block_samples=block_samples,
                                       joint=True))
    path = tmp_path / "long.wv"
    path.write_bytes(data)
    return pcm, data, path


def test_scan_headers_file_matches_eager(tmp_path):
    from wvpk.container import scan_headers
    _pcm, data, path = make_file(tmp_path)
    with open(path, "rb") as f:
        # tiny chunks force the slide/refill paths
        got = scan_headers_file(f, chunk_size=300)
    want = scan_headers(data)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.stream_position, g.ck_size, g.flags, g.crc,
                g.block_index, g.block_samples) == \
               (w.stream_position, w.ck_size, w.flags, w.crc,
                w.block_index, w.block_samples)


def test_streaming_decode_bit_exact(tmp_path):
    pcm, _data, path = make_file(tmp_path)
    wpc = api.WavpackOpenFileInput(path, streaming=True)
    assert wpc.error_message == ""
    assert wpc.streaming
    n = len(pcm)
    buf = np.zeros(n * 2, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, n) == n
    np.testing.assert_array_equal(buf.reshape(-1, 2), pcm)
    assert wpc.crc_errors == 0
    wpc.close()


def test_streaming_matches_eager_getters(tmp_path):
    _pcm, data, path = make_file(tmp_path)
    s = api.WavpackOpenFileInput(path, streaming=True)
    e = api.WavpackOpenFileInput(data)
    assert api.WavpackGetNumSamples(s) == api.WavpackGetNumSamples(e)
    assert api.WavpackGetSampleRate(s) == api.WavpackGetSampleRate(e)
    assert api.WavpackGetNumChannels(s) == api.WavpackGetNumChannels(e)
    assert api.WavpackGetBitsPerSample(s) == api.WavpackGetBitsPerSample(e)
    assert api.WavpackGetMode(s) == api.WavpackGetMode(e)
    assert api.WavpackGetHeader(s) == api.WavpackGetHeader(e)
    assert api.WavpackGetTrailer(s) == api.WavpackGetTrailer(e)
    s.close()


def test_segment_cache_eviction(tmp_path):
    pcm, _data, path = make_file(tmp_path)
    config.set_options(batch_blocks=4, cache_segments=6)
    try:
        wpc = api.WavpackOpenFileInput(path, streaming=True)
        n = len(pcm)
        buf = np.zeros(n * 2, np.int32)
        got = 0
        # chunked sequential decode: the decoded-segment cache must stay
        # bounded the whole way through
        step = 500
        while got < n:
            k = api.WavpackUnpackSamples(wpc, buf[got * 2:], min(step, n - got))
            if k == 0:
                break
            got += k
            assert len(wpc._decoded) <= 6
        assert got == n
        np.testing.assert_array_equal(buf.reshape(-1, 2), pcm)
        # payload LRU is bounded too
        assert len(wpc.blocks._cache) <= wpc.blocks._cap
        wpc.close()
    finally:
        config.set_options(batch_blocks=256, cache_segments=1024)


def test_streaming_seek(tmp_path):
    pcm, _data, path = make_file(tmp_path)
    wpc = api.WavpackOpenFileInput(path, streaming=True)
    assert api.SetSample(wpc, 3000)
    buf = np.zeros(700 * 2, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, 700) == 700
    np.testing.assert_array_equal(buf.reshape(-1, 2), pcm[3000:3700])
    wpc.close()


def test_streaming_corrupt_block_concealed(tmp_path):
    pcm, data, path = make_file(tmp_path, n_blocks=6)
    # corrupt the metadata TLV of the 3rd block so its lazy parse fails
    from wvpk.container import scan_headers
    hdrs = scan_headers(data)
    mut = bytearray(data)
    mut[hdrs[2].stream_position + 32] = 0x7F  # bogus metadata id/len
    mut[hdrs[2].stream_position + 33] = 0xFF
    path.write_bytes(bytes(mut))
    wpc = api.WavpackOpenFileInput(path, streaming=True)
    n = len(pcm)
    buf = np.zeros(n * 2, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, n) == n
    out = buf.reshape(-1, 2)
    bs = 256
    np.testing.assert_array_equal(out[:2 * bs], pcm[:2 * bs])
    np.testing.assert_array_equal(out[2 * bs:3 * bs], 0)  # concealed
    np.testing.assert_array_equal(out[3 * bs:], pcm[3 * bs:])
    assert wpc.mute_blocks >= 1
    wpc.close()


def test_streaming_auto_threshold(tmp_path):
    _pcm, data, path = make_file(tmp_path, n_blocks=4)
    config.set_options(stream_threshold=1)
    try:
        wpc = api.WavpackOpenFileInput(path)
        assert wpc.streaming
        wpc.close()
    finally:
        config.set_options(stream_threshold=64 << 20)
    wpc = api.WavpackOpenFileInput(path)  # back above threshold: eager
    assert not wpc.streaming


def test_cli_streaming_matches_eager(tmp_path):
    from wvpk import cli
    pcm, _data, path = make_file(tmp_path, n_blocks=6)
    out_e = tmp_path / "eager.wav"
    out_s = tmp_path / "stream.wav"
    assert cli.main([str(path), "-o", str(out_e), "-q"]) == 0
    assert cli.main([str(path), "-o", str(out_s), "-q", "--streaming"]) == 0
    assert out_e.read_bytes() == out_s.read_bytes()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))


def test_streaming_multichannel_seek(tmp_path):
    """Streaming mode composes with OPEN_ALL_CHANNELS multichannel
    segments and mid-file SetSample seek (reference seek analog:
    WavPackUtils.cs:504-594 over a 5.1 stream set)."""
    from wvpk import consts
    from wvpk.testgen import EncodeSpec, encode_multichannel
    rng = np.random.default_rng(31)
    pcm = np.round(rng.normal(0, 20000, (1200, 6))).astype(np.int64)
    data = encode_multichannel(pcm, EncodeSpec(
        block_samples=300, joint=True, bytes_stored=3,
        terms=(18, 17, 2), deltas=(2, 2, 2)))
    path = tmp_path / "mc.wv"
    path.write_bytes(data)
    wpc = api.WavpackOpenFileInput(str(path),
                                   flags=consts.OPEN_ALL_CHANNELS,
                                   streaming=True)
    assert api.WavpackGetErrorMessage(wpc) == ""
    assert wpc.streaming and api.WavpackGetNumChannels(wpc) == 6
    buf = np.zeros(1200 * 6, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, 1200) == 1200
    np.testing.assert_array_equal(buf.reshape(-1, 6), pcm)
    # seek into the third segment and re-decode the suffix
    assert api.SetSample(wpc, 700)
    tail = np.zeros(500 * 6, np.int32)
    assert api.WavpackUnpackSamples(wpc, tail, 500) == 500
    np.testing.assert_array_equal(tail.reshape(-1, 6), pcm[700:])
    assert api.WavpackGetNumErrors(wpc) == 0
    wpc.close()
