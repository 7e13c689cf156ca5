/* argen -- native auto-regressive grain pattern recurrence.
 *
 * The 2-D AR recurrence (raster scan, causal <=lag-3 neighborhood with an
 * additive LFSR-indexed Gaussian term; semantics of vfgs_fw.c:410-502) is
 * inherently serial, and a per-frame config-switching stream regenerates up
 * to three patterns per switch.  The pure-python fallback in
 * models/patterns.py costs ~0.5s per config; this native loop runs in ~1ms.
 *
 * The coefficient-layout mapping (SEI 6-value vs AFGS1 lag packing) stays in
 * python; only the work-buffer fill is native.  Bit-exact: int32 arithmetic,
 * arithmetic shifts, clip to +-127.
 */

#include <stdint.h>

static uint32_t lfsr_step(uint32_t x)
{
    uint32_t s = ((x << 30) ^ (x << 2)) & 0x80000000u;
    return s | (x >> 1);
}

/* Fill the AR work buffer.  coef: 4x7 int32 causal kernel; gauss: 2048 int8;
 * buf0: luma work buffer for cross-component injection (may be NULL),
 * accessed with the caller-provided stride quirk; buf: width*height int8 out.
 * Returns the final LFSR state. */
uint32_t vfgs_ar_fill(const int32_t *coef, const int8_t *gauss, uint32_t seed,
                      int32_t width, int32_t height, int32_t scale,
                      int32_t shift, int32_t cx, const int8_t *buf0,
                      int32_t buf0_len, int32_t subx, int32_t suby,
                      int8_t *buf)
{
    uint32_t rnd = seed;
    /* scale/shift of 0 is UB in the C model (round macro shifts by -1);
     * substitute a deterministic zero bias, matching the python fallback. */
    const int32_t rbias = shift >= 1 ? 1 << (shift - 1) : 0;
    const int32_t sbias = scale >= 1 ? 1 << (scale - 1) : 0;
    for (int32_t y = 0; y < height; y++) {
        for (int32_t x = 0; x < width; x++) {
            int32_t g = 0;
            if (y >= 3 && x >= 3 && x < width - 3) {
                for (int32_t j = -3; j <= 0; j++)
                    for (int32_t i = -3; i <= 3; i++) {
                        if (!(i < 0 || j < 0))
                            break;
                        g += coef[(3 + j) * 7 + (3 + i)]
                             * buf[width * (y + j) + x + i];
                    }
                if (cx && buf0) {
                    int32_t ii = (x - 3) * subx + 3;
                    int32_t jj = (y - 3) * suby + 3;
                    int32_t stride0 = width * subx;
                    int32_t z = 0;
                    int32_t idx = stride0 * jj + ii;
                    z += (idx >= 0 && idx < buf0_len) ? buf0[idx] : 0;
                    if (subx > 1) {
                        idx = stride0 * jj + ii + 1;
                        z += (idx >= 0 && idx < buf0_len) ? buf0[idx] : 0;
                    }
                    if (suby > 1) {
                        idx = stride0 * (jj + 1) + ii;
                        z += (idx >= 0 && idx < buf0_len) ? buf0[idx] : 0;
                        idx = stride0 * (jj + 1) + ii + 1;
                        z += (idx >= 0 && idx < buf0_len) ? buf0[idx] : 0;
                    }
                    g += cx * ((z + (1 << (subx + suby - 3))) >> (subx + suby - 2));
                }
                g = (g + sbias) >> scale;
            }
            g += ((int32_t)gauss[rnd & 2047] + rbias) >> shift;
            rnd = lfsr_step(rnd);
            if (g > 127) g = 127;
            if (g < -127) g = -127;
            buf[width * y + x] = (int8_t)g;
        }
    }
    return rnd;
}
