/* Native host runtime: WavPack container scanning and bitstream staging.
 *
 * The device compute path is JAX/XLA; this C tier accelerates the host
 * side of the pipeline (the reference has no native tier to mirror — it is
 * 100% C# — so this covers the host hot spots of OUR runtime: the
 * full-file header scan that builds the block index, and the memcpy fan-in
 * that stages per-lane bitstreams).
 *
 * Header semantics match wvpk/container/header.py (reference
 * WavPackUtils.cs:600-671): magic + sanity check, <=1 MiB resync,
 * WavPack5 40-bit total_samples/block_index high bytes at offsets 11/10.
 */

#include <stdint.h>
#include <string.h>

#define FIELDS_PER_HEADER 8
#define MAX_RESYNC 1048576L

/* out layout per header (int64 each):
 * ck_size, version, total_samples, block_index, block_samples, flags,
 * crc (sign-extended int32), stream_position */
long wvpk_scan_headers(const uint8_t *data, long n, int64_t *out,
                       long max_headers)
{
    long pos = 0, count = 0;
    while (pos + 32 <= n && count < max_headers) {
        long skipped = 0;
        int found = 0;
        while (pos + 32 <= n) {
            const uint8_t *b = data + pos;
            if (b[0] == 'w' && b[1] == 'v' && b[2] == 'p' && b[3] == 'k' &&
                !(b[4] & 1) && b[6] < 16 && b[7] == 0 && b[9] == 4 &&
                b[8] >= 0x02 && b[8] <= 0x10) {
                found = 1;
                break;
            }
            pos++;
            if (++skipped > MAX_RESYNC)
                return count;
        }
        if (!found)
            break;
        const uint8_t *b = data + pos;
        int64_t *h = out + count * FIELDS_PER_HEADER;
        uint32_t ck = (uint32_t)b[4] | ((uint32_t)b[5] << 8) |
                      ((uint32_t)b[6] << 16) | ((uint32_t)b[7] << 24);
        h[0] = (int64_t)ck;
        h[1] = (int64_t)((uint32_t)b[8] | ((uint32_t)b[9] << 8));
        h[2] = ((int64_t)b[11] << 32) |
               ((uint32_t)b[12] | ((uint32_t)b[13] << 8) |
                ((uint32_t)b[14] << 16) | ((uint32_t)b[15] << 24));
        h[3] = ((int64_t)b[10] << 32) |
               ((uint32_t)b[16] | ((uint32_t)b[17] << 8) |
                ((uint32_t)b[18] << 16) | ((uint32_t)b[19] << 24));
        h[4] = (int64_t)((uint32_t)b[20] | ((uint32_t)b[21] << 8) |
                         ((uint32_t)b[22] << 16) | ((uint32_t)b[23] << 24));
        h[5] = (int64_t)((uint32_t)b[24] | ((uint32_t)b[25] << 8) |
                         ((uint32_t)b[26] << 16) | ((uint32_t)b[27] << 24));
        h[6] = (int64_t)(int32_t)((uint32_t)b[28] | ((uint32_t)b[29] << 8) |
                                  ((uint32_t)b[30] << 16) |
                                  ((uint32_t)b[31] << 24));
        h[7] = pos;
        count++;
        pos += (long)ck + 8;
    }
    return count;
}

/* Stage L payload slices of `blob` into a (L, stride) byte matrix whose
 * rows are pre-filled with the 0xff EOF fill. */
void wvpk_pack_streams(const uint8_t *blob, const int64_t *offs,
                       const int64_t *lens, long L, uint8_t *out,
                       long stride)
{
    long i;
    for (i = 0; i < L; i++) {
        long len = (long)lens[i];
        if (len > stride)
            len = stride;
        memcpy(out + i * stride, blob + offs[i], (size_t)len);
    }
}
