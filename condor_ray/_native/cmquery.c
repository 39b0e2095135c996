/* Fused dense Count-Min kernels: H3 hash (byte-LUT form) + row gather,
 * one pass per key — no (n x height) numpy temporaries (the numpy path
 * streams ~10 full-width intermediates per block; at 32-way concurrency
 * that traffic IS the evaluator's bottleneck).
 *
 * Bit-exact contract with the numpy path (hashing.py / sketches.py):
 *   H = lut0[b0] ^ lut1[b1] ^ lut2[b2] ^ lut3[b3]      (int32)
 *   if (H < 0) H = -H                                   (wraps at INT_MIN,
 *                                                        Java -MIN == MIN)
 *   idx = floor_mod(H, width)                           (np.remainder)
 *   query: out[i] = min_j dense[j*width + idx_j]        (int32)
 *   update: dense[j*width + idx_j] += sign              (int32 wraparound)
 *
 * lut: int32[4][256][h] contiguous; dense: int32[h][width] contiguous.
 */
#include <stdint.h>

void cm_query_dense(const int32_t *keys, long n,
                    const int32_t *lut, long h, long width,
                    const int32_t *dense, int32_t *out) {
    const int32_t *l0 = lut;
    const int32_t *l1 = lut + 256 * h;
    const int32_t *l2 = lut + 512 * h;
    const int32_t *l3 = lut + 768 * h;
    for (long i = 0; i < n; i++) {
        uint32_t v = (uint32_t)keys[i];
        const int32_t *a = l0 + (long)(v & 0xFFu) * h;
        const int32_t *b = l1 + (long)((v >> 8) & 0xFFu) * h;
        const int32_t *c = l2 + (long)((v >> 16) & 0xFFu) * h;
        const int32_t *d = l3 + (long)(v >> 24) * h;
        int32_t best = INT32_MAX;
        for (long j = 0; j < h; j++) {
            int32_t H = a[j] ^ b[j] ^ c[j] ^ d[j];
            if (H < 0)
                H = (int32_t)(0u - (uint32_t)H); /* wraps at INT32_MIN */
            long idx = (long)(H % width);
            if (idx < 0)
                idx += width; /* floor mod, matches np.remainder */
            int32_t e = dense[j * width + idx];
            if (e < best)
                best = e;
        }
        out[i] = best;
    }
}

void cm_update_dense(const int32_t *keys, long n,
                     const int32_t *lut, long h, long width,
                     int32_t *dense, int32_t sign) {
    const int32_t *l0 = lut;
    const int32_t *l1 = lut + 256 * h;
    const int32_t *l2 = lut + 512 * h;
    const int32_t *l3 = lut + 768 * h;
    for (long i = 0; i < n; i++) {
        uint32_t v = (uint32_t)keys[i];
        const int32_t *a = l0 + (long)(v & 0xFFu) * h;
        const int32_t *b = l1 + (long)((v >> 8) & 0xFFu) * h;
        const int32_t *c = l2 + (long)((v >> 16) & 0xFFu) * h;
        const int32_t *d = l3 + (long)(v >> 24) * h;
        for (long j = 0; j < h; j++) {
            int32_t H = a[j] ^ b[j] ^ c[j] ^ d[j];
            if (H < 0)
                H = (int32_t)(0u - (uint32_t)H);
            long idx = (long)(H % width);
            if (idx < 0)
                idx += width;
            dense[j * width + idx] =
                (int32_t)((uint32_t)dense[j * width + idx] + (uint32_t)sign);
        }
    }
}
