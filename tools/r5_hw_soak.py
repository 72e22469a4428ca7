"""Round-5 hardware soak: differential coverage for the surfaces that
landed after the round-4 backlog ran — native-C DSD encoders, lossy
float encode, DSF container, device-side segment packing — all decoded
on the REAL TPU kernels (engine.decode_states) against host truth.

Usage: python tools/r5_hw_soak.py [n_cases] (default 24)
Prints one summary line per family; exits nonzero on any mismatch.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def soak_dsd_encode(rng, n_cases):
    """Native-C DSD coders (modes 1/3, bins 2..32) -> device decode
    must reproduce the source bytes with clean CRCs."""
    from wvpk.container import parse_blocks
    from wvpk.encode import encode_dsd
    from wvpk.engine import decode_states
    fails = 0
    for i in range(n_cases):
        mode = (1, 3, 1, 3)[i % 4]
        hb = int(rng.integers(1, 6)) if mode == 1 else 1
        ch = 1 + (i // 2) % 2
        n = int(rng.integers(2048, 12288))
        kind = i % 3
        if kind == 0:
            d = rng.integers(0, 256, (n, ch))
        elif kind == 1:
            base = 128 + 100 * np.sin(np.arange(n * ch) / 11.0)
            d = np.clip(base + rng.integers(-25, 26, n * ch),
                        0, 255).reshape(n, ch)
        else:
            d = np.full((n, ch), 0x55)
        d = d.astype(np.uint8)
        wv = encode_dsd(d, mode, history_bits=hb,
                        block_samples=int(rng.integers(1024, 8192)))
        res = decode_states([b.state for b in parse_blocks(wv)])
        out = np.concatenate([r.samples for r in res]).reshape(-1, ch)
        if any(r.crc_error or r.mute_error for r in res) \
                or not np.array_equal(out & 0xFF, d):
            fails += 1
            print(f"  DSD-ENC FAIL case {i}: mode={mode} hb={hb} ch={ch}")
    return fails, n_cases


def soak_lossy_float(rng, n_cases):
    """Lossy float encode (host AND device) -> device decode restores
    the quantized grid exactly."""
    from wvpk.container import parse_blocks
    from wvpk.encode import encode, encode_device, float_grid_info
    from wvpk.engine import decode_states
    fails = 0
    for i in range(n_cases):
        scale = float(10.0 ** rng.uniform(-8, 25))
        ch = 1 + i % 2
        n = int(rng.integers(2000, 9000))
        f = (rng.normal(0, scale, (n, ch))).astype(np.float32)
        gi = float_grid_info(f)
        for dev in (False, True):
            wv = (encode_device if dev else encode)(
                f, float_lossy=True, block_samples=2048)
            blocks = parse_blocks(wv)
            res = decode_states([b.state for b in blocks])
            out = np.concatenate([r.samples for r in res]).reshape(-1, ch)
            ne = blocks[0].state.float_norm_exp
            restored = out.astype(np.float64) * 2.0 ** (ne - 150)
            err = np.abs(restored - f).max() if gi["lossless"] is False \
                else np.abs(restored - f).max()
            if any(r.crc_error or r.mute_error for r in res) \
                    or err > gi["grid_step"] / 2 + 1e-300:
                fails += 1
                print(f"  LOSSY-FLOAT FAIL case {i} dev={dev}: "
                      f"err={err:.3g} step={gi['grid_step']:.3g}")
    return fails, 2 * n_cases


def soak_dsf(rng, n_cases):
    """DSF container roundtrip with DEVICE decode in the middle:
    .dsf -> .wv -> (TPU decode) -> rebuilt .dsf must be byte-exact."""
    import tempfile

    from wvpk.cli import main as cli_main
    from wvpk.io.dsf import make_dsf
    fails = 0
    for i in range(n_cases):
        mode = (0, 1, 3)[i % 3]
        ch = 1 + i % 2
        nbytes = int(rng.integers(4096, 16384)) & ~7
        d = rng.integers(0, 256, (nbytes, ch)).astype(np.uint8)
        blob = make_dsf(d, 2822400)
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.dsf")
            wv = os.path.join(td, "out.wv")
            back = os.path.join(td, "back.dsf")
            open(src, "wb").write(blob)
            rc1 = cli_main(["--encode", src, "-o", wv,
                            "--dsd-mode", str(mode), "-q"])
            rc2 = cli_main([wv, "-o", back, "-q"])
            ok = rc1 == 0 and rc2 == 0 \
                and open(back, "rb").read() == blob
        if not ok:
            fails += 1
            print(f"  DSF FAIL case {i}: mode={mode} ch={ch} "
                  f"rc={rc1}/{rc2}")
    return fails, n_cases


def soak_device_pack(rng, n_cases):
    """Device-side segment packing vs the host packer: byte-identical
    block streams on the real chip (lossless + hybrid + wvx)."""
    from wvpk import config
    from wvpk.encode import build_spec
    from wvpk.engine.device_encoder import encode_blocks_device
    fails = 0
    for i in range(n_cases):
        hybrid = i % 3 == 1
        wide = i % 3 == 2
        n = int(rng.integers(3000, 20000))
        if wide:
            sig = rng.normal(0, 1 << 26, (n, 2))
            pcm = np.clip(np.round(sig), -(1 << 30), (1 << 30) - 1) \
                .astype(np.int64)
            spec = build_spec(pcm, bytes_per_sample=4, block_samples=4096)
        else:
            sig = rng.normal(0, 6000, (n, 2))
            pcm = np.clip(np.round(sig), -32768, 32767).astype(np.int64)
            spec = build_spec(pcm, hybrid=hybrid, block_samples=4096)
        outs = {}
        for pack in (True, False):
            config.set_options(encode_device_pack=pack)
            try:
                outs[pack] = b"".join(encode_blocks_device(
                    pcm, spec, warmup=512 if i % 2 else 0))
            finally:
                config.set_options(encode_device_pack=True)
        if outs[True] != outs[False]:
            fails += 1
            print(f"  DEVPACK FAIL case {i}: hybrid={hybrid} wide={wide}")
    return fails, n_cases


def soak_wvc(rng, n_cases):
    """Hybrid-lossless pairs on the REAL TPU kernels: C-native encode
    (Python-coder byte-identity assumed from the CI differential),
    fused wvc decode must restore the source exactly with both CRC
    gates green; every 4th case corrupts the correction payload and
    must flag crc_error."""
    from wvpk.container import parse_blocks
    from wvpk.container.blocks import pair_wvc
    from wvpk.encode import encode
    from wvpk.engine import decode_states
    fails = 0
    for i in range(n_cases):
        ch = 1 + (i // 2) % 2
        n = int(rng.integers(3000, 20000))
        sig = (3000 * np.sin(np.arange(n) / (5 + i))[:, None]
               + rng.normal(0, 10 ** rng.uniform(1, 3.5), (n, ch)))
        pcm = np.clip(np.round(sig), -32768, 32767).astype(np.int32)
        if ch == 1:
            pcm = pcm[:, 0]
        wv, wvc = encode(pcm, hybrid=True, wvc=True,
                         bitrate=int(rng.integers(250, 900)),
                         preset=("fast", "default", "high")[i % 3],
                         block_samples=int(rng.integers(1024, 4097)))
        corrupt = i % 4 == 3
        if corrupt:
            wvc = bytearray(wvc)
            wvc[int(rng.integers(40, len(wvc)))] ^= 0x20
            wvc = bytes(wvc)
        blocks = parse_blocks(wv)
        pair_wvc(blocks, wvc)
        res = decode_states([b.state for b in blocks])
        out = np.concatenate([r.samples for r in res])
        src = pcm if pcm.ndim > 1 else pcm[:, None]
        if corrupt:
            ok = any(r.crc_error for r in res)
        else:
            ok = (not any(r.crc_error or r.mute_error for r in res)
                  and np.array_equal(out[:, :src.shape[1]], src))
        if not ok:
            fails += 1
            print(f"  WVC FAIL case {i}: ch={ch} corrupt={corrupt}")
    return fails, n_cases


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rng = np.random.default_rng(int(os.environ.get("WVPK_SOAK_SEED",
                                                   "500000")))
    total_f = total_c = 0
    for name, fn, cases in (
            ("dsd_encode", soak_dsd_encode, n_cases),
            ("lossy_float", soak_lossy_float, max(n_cases // 2, 4)),
            ("dsf", soak_dsf, max(n_cases // 2, 6)),
            ("wvc", soak_wvc, max(n_cases // 2, 8)),
            ("device_pack", soak_device_pack, max(n_cases // 3, 6))):
        t0 = time.perf_counter()
        f, c = fn(rng, cases)
        total_f += f
        total_c += c
        print(f"{name}: {c} cases, {f} fails "
              f"({time.perf_counter() - t0:.1f}s)")
    print(f"r5 soak total: {total_c} cases, {total_f} fails")
    return 1 if total_f else 0


if __name__ == "__main__":
    sys.exit(main())
