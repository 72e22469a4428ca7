"""Randomized streaming-encode soak: host + device(XLA-on-CPU) backends,
random window splits vs the batch encoders, decode-exactness + MD5 + and
(device) byte-identity gates. Seeds disjoint from unit tests."""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")
from wvpk.container import parse_blocks
from wvpk.encode import encode, encode_device, encode_wav_file
from wvpk.io.pcm import format_samples
from wvpk.io.wav import make_wav_header, read_wav
from wvpk.ref import decode_block

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 9100)
N_CASES = int(sys.argv[2]) if len(sys.argv) > 2 else 30


def oracle_decode(data):
    outs = []
    for b in parse_blocks(data):
        r = decode_block(b.state)
        assert not r.crc_error and not r.mute_error
        outs.append(r.samples)
    return np.concatenate(outs)


def stored_md5(data):
    for b in parse_blocks(data):
        if b.updates.md5 is not None:
            return b.updates.md5
    return None


fails = 0
tmp = tempfile.mkdtemp()
def decode_segments(data):
    from collections import defaultdict
    seg = defaultdict(list)
    for b in parse_blocks(data):
        r = decode_block(b.state)
        assert not r.crc_error and not r.mute_error
        seg[b.header.block_index].append(r.samples)
    return np.concatenate([np.concatenate(seg[k], 1) for k in sorted(seg)])


for case in range(N_CASES):
    ch = int(rng.choice([1, 1, 2, 2, 2, 3, 4, 6, 8]))
    bits = int(rng.choice([8, 16, 24, 32]))
    scale = {8: 45, 16: 6000, 24: 700000, 32: 30_000_000}[bits]
    n = int(rng.integers(700, 6000))
    bs = int(rng.choice([256, 512, 1024, 2048]))
    win = bs * int(rng.integers(1, 5))
    hybrid = bool(rng.random() < 0.3) and bits <= 24
    device = bool(rng.random() < 0.5) and bits <= 24
    fstereo = ch == 2 and rng.random() < 0.15
    preset = str(rng.choice(["fast", "default", "high"]))
    x = scale * np.sin(2 * np.pi * np.arange(n)[:, None] / 97.0) \
        + rng.normal(0, scale / 40, (n, ch))
    pcm = np.round(x).astype(np.int64)
    if bits == 32 and rng.random() < 0.5:
        pcm <<= int(rng.integers(1, 6))   # zeros routing
    if fstereo:
        pcm[:, 1] = pcm[:, 0]
    tag = (f"case {case}: ch={ch} bits={bits} n={n} bs={bs} win={win} "
           f"hyb={hybrid} dev={device} fs={fstereo} {preset}")
    try:
        bps = (bits + 7) // 8
        p = os.path.join(tmp, "in.wav")
        with open(p, "wb") as f:
            f.write(make_wav_header(n, ch, 44100, bits, bps))
            f.write(format_samples(pcm, bps))
        out = os.path.join(tmp, "out.wv")
        kw = dict(block_samples=bs, preset=preset, hybrid=hybrid,
                  bitrate=int(rng.integers(384, 1200)))
        encode_wav_file(p, out, device=device, window_samples=win, **kw)
        data = open(out, "rb").read()
        got = decode_segments(data) if ch > 2 else oracle_decode(data)
        _, rate, _, header, trailer = read_wav(open(p, "rb").read())
        bkw = dict(sample_rate=rate, bytes_per_sample=bps,
                   riff_header=header, riff_trailer=trailer, **kw)
        batch = (encode_device if device else encode)(pcm, **bkw)
        want = decode_segments(batch) if ch > 2 else oracle_decode(batch)
        multiwin = win < n
        if hybrid and not device and multiwin:
            # host hybrid multiwindow: window-1 medians come from
            # window 1 (batch: whole file) -> different lossy choices;
            # the contract is error comparable to batch, not
            # batch-equality
            es = np.abs(got[:, :ch].astype(np.int64) - pcm).mean()
            eb = np.abs(want[:, :ch].astype(np.int64) - pcm).mean()
            assert es <= eb * 1.5 + 1, f"hybrid error {es} vs batch {eb}"
        else:
            assert np.array_equal(got, want), "decode mismatch vs batch"
        assert stored_md5(data) == stored_md5(batch), "md5 mismatch"
        if not hybrid:
            ref = pcm if not fstereo else pcm
            assert np.array_equal(got[:, :ch] if got.ndim > 1 else got,
                                  ref), "lossless not exact"
        if device:
            assert data == batch, "device streaming not byte-identical"
    except Exception as e:
        fails += 1
        print(f"FAIL {tag}: {type(e).__name__}: {e}", flush=True)
    if (case + 1) % 10 == 0:
        print(f"... {case + 1}/{N_CASES}", flush=True)
print(f"stream-encode soak: {fails} fails / {N_CASES} cases")
