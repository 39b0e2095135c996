/* PNG scanline unfilter (RFC 2083 §6): reconstruct all five filter types
 * in one pass over the image.  Sub/Average/Paeth carry a horizontal
 * byte-to-byte data dependency, so Python/numpy cannot vectorize them;
 * this kernel makes the whole-image reconstruct a single C loop.
 *
 * scan: h*stride bytes of filtered scanline data (NO leading filter
 * bytes), modified IN PLACE to the reconstructed bytes.
 * filters: h filter-type bytes (one per row).
 * Returns 0 on success, -1 on a bad filter byte (caller raises).
 */

int png_unfilter(const unsigned char *filters, unsigned char *scan,
                 long h, long stride, long ch) {
    const unsigned char *prev = 0;
    long y, i;
    for (y = 0; y < h; y++) {
        unsigned char *cur = scan + y * stride;
        int f = filters[y];
        switch (f) {
        case 0: /* None */
            break;
        case 1: /* Sub */
            for (i = ch; i < stride; i++)
                cur[i] = (unsigned char)(cur[i] + cur[i - ch]);
            break;
        case 2: /* Up */
            if (prev)
                for (i = 0; i < stride; i++)
                    cur[i] = (unsigned char)(cur[i] + prev[i]);
            break;
        case 3: /* Average */
            for (i = 0; i < stride; i++) {
                int left = i >= ch ? cur[i - ch] : 0;
                int up = prev ? prev[i] : 0;
                cur[i] = (unsigned char)(cur[i] + ((left + up) >> 1));
            }
            break;
        case 4: /* Paeth */
            for (i = 0; i < stride; i++) {
                int a = i >= ch ? cur[i - ch] : 0;
                int b = prev ? prev[i] : 0;
                int c = (prev && i >= ch) ? prev[i - ch] : 0;
                int p = a + b - c;
                int pa = p >= a ? p - a : a - p;
                int pb = p >= b ? p - b : b - p;
                int pc = p >= c ? p - c : c - p;
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                cur[i] = (unsigned char)(cur[i] + pred);
            }
            break;
        default:
            return -1;
        }
        prev = cur;
    }
    return 0;
}
