/* Dev-only golden generator for chroma formats unreachable through the
 * reference CLI (4:2:2 / 4:4:4 are rejected at startup because the built-in
 * default config carries chroma grain, vfgs_main.c:739).  Drives the
 * reference FW/HW layers directly with a luma-only FGC SEI config or an
 * AFGS1 config, over a raw YUV stream.
 *
 * Build (needs the reference sources):
 *   gcc -O2 tools/gen_golden_formats.c /root/reference/src/vfgs_fw.c \
 *       /root/reference/src/vfgs_hw.c -I/root/reference/src -o /tmp/refbuild/goldfmt
 *
 * Usage: goldfmt <mode:sei|afgs1> <w> <h> <depth> <subx> <suby> <frames> <in> <out>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "vfgs_fw.h"
#include "vfgs_hw.h"

int main(int argc, char **argv)
{
    if (argc < 10) { fprintf(stderr, "args\n"); return 2; }
    const char *mode = argv[1];
    int w = atoi(argv[2]), h = atoi(argv[3]), depth = atoi(argv[4]);
    int subx = atoi(argv[5]), suby = atoi(argv[6]), frames = atoi(argv[7]);
    FILE *fi = fopen(argv[8], "rb");
    FILE *fo = fopen(argv[9], "wb");
    if (!fi || !fo) { fprintf(stderr, "io\n"); return 2; }

    vfgs_set_depth(depth);
    vfgs_set_chroma_subsampling(subx, suby);

    if (!strcmp(mode, "sei")) {
        static fgs_sei sei = {
            .model_id = 0,
            .log2_scale_factor = 5,
            .comp_model_present_flag = { 1, 0, 0 },
            .num_intensity_intervals = { 4, 0, 0 },
            .num_model_values = { 3, 0, 0 },
            .intensity_interval_lower_bound = {{ 0, 60, 120, 180 }},
            .intensity_interval_upper_bound = {{ 59, 119, 179, 255 }},
            .comp_model_value = {{ {90, 4, 6}, {120, 8, 8}, {140, 11, 9},
                                   {160, 14, 14} }},
        };
        vfgs_init_sei(&sei);
    } else {
        static fgs_afgs1 afgs1 = {
            .grain_seed = 7391,
            .num_y_points = 3,
            .point_y_values = { 0, 100, 255 },
            .point_y_scaling = { 60, 100, 30 },
            .chroma_scaling_from_luma = 0,
            .num_cb_points = 0,
            .num_cr_points = 0,
            .grain_scaling = 9,
            .ar_coeff_lag = 2,
            .ar_coeffs_y = { 4, -3, 2, 1, -2, 8, 40, 10, -5, 2, 1, 0 },
            .ar_coeff_shift = 7,
            .grain_scale_shift = 1,
            .clip_to_restricted_range = 1,
        };
        vfgs_init_afgs1(&afgs1);
    }

    int sz = depth > 8 ? 2 : 1;
    int cw = w / subx, ch = h / suby;
    size_t fb = (size_t)(w * h + 2 * cw * ch) * sz;
    unsigned char *buf = malloc(fb);
    for (int n = 0; n < frames; n++) {
        if (fread(buf, 1, fb, fi) != fb) break;
        unsigned char *Y = buf;
        unsigned char *U = buf + (size_t)w * h * sz;
        unsigned char *V = U + (size_t)cw * ch * sz;
        for (int y = 0; y < h; y++) {
            vfgs_add_grain_line(Y, U, V, y, w);
            Y += (size_t)w * sz;
            if ((y & 1) || (h == ch))
            {
                U += (size_t)cw * sz;
                V += (size_t)cw * sz;
            }
        }
        fwrite(buf, 1, fb, fo);
    }
    fclose(fi);
    fclose(fo);
    return 0;
}
