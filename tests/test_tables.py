import numpy as np

from wvpk.tables import (EXP2_TABLE, LOG2_TABLE, NBITS_TABLE,
                         ONES_COUNT_TABLE, count_bits, exp2s, i32, log2s,
                         mylog2, restore_weight, store_weight)


def test_ones_count_table():
    # trailing-ones count per byte (WordsUtils.cs:57-66)
    for i in range(256):
        t = 0
        while t < 8 and (i >> t) & 1:
            t += 1
        assert ONES_COUNT_TABLE[i] == t


def test_nbits_table():
    for i in range(256):
        assert NBITS_TABLE[i] == i.bit_length()


def test_log_exp_roundtrip_error():
    # roundtrip error never exceeds 1 part in 225 except +/-115, +/-195
    # (WordsUtils.cs:579-582)
    for v in list(range(0, 1024)) + [2 ** k for k in range(10, 31)]:
        log = mylog2(v)
        back = exp2s(log)
        assert abs(back - v) <= max(2, v // 225 + 1), (v, back)


def test_log2s_signed():
    for v in (-5, -1000, 7, 123456):
        assert exp2s(log2s(v)) * (1 if v >= 0 else -1) >= 0


def test_weight_roundtrip_idempotent():
    for w in range(-1200, 1201, 7):
        b = store_weight(w)
        r = restore_weight(b)
        # quantization is idempotent: store(restore(b)) == b
        assert store_weight(r) == b
        assert abs(r - max(-1024, min(1024, w))) <= 10


def test_count_bits():
    assert count_bits(0) == 0
    assert count_bits(1) == 1
    assert count_bits(255) == 8
    assert count_bits(256) == 9
    assert count_bits((1 << 31) - 1) == 31


def test_i32_wrap():
    assert i32(0x80000000) == -2147483648
    assert i32(0x7FFFFFFF) == 2147483647
    assert i32(-0x80000001) == 0x7FFFFFFF
    assert len(LOG2_TABLE) == len(EXP2_TABLE) == 256
