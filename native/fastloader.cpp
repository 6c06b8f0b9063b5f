// fastloader: native host-side batch image pipeline for epipolarpose_tpu.
//
// The reference's host hot path is per-sample cv2 decode + warpAffine inside
// torch DataLoader workers (SURVEY.md §3.1). This C++ equivalent fuses
// JPEG decode -> bilinear affine warp -> [0,1] float conversion for a WHOLE
// batch in one call, parallelized with OpenMP — one Python->native hop per
// batch instead of per sample, no intermediate full-size float images.
//
// Exposed via ctypes (no pybind11 in this image). All matrices are the
// cv2-convention src->dst affines produced by geometry.affine; inversion
// happens here. Out-of-bounds samples read as 0 (BORDER_CONSTANT).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <csetjmp>
#include <cmath>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Decode one JPEG buffer to RGB uint8. Returns 0 on success.
// scale_num/8 is libjpeg-turbo's DCT-domain scaling: decoding a 1000px
// source at 2/8 before a 256px crop does 1/16 the IDCT + color-convert
// work AND box-filters the DCT blocks (less aliasing than subsampled
// bilinear). full_w/full_h report the pre-scaling geometry so the caller
// can fix up its affine.
int decode_one(const uint8_t* buf, size_t size, std::vector<uint8_t>& out,
               int& w, int& h, int scale_num = 8,
               int* full_w = nullptr, int* full_h = nullptr) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
                 static_cast<unsigned long>(size));
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    cinfo.scale_num = scale_num;
    cinfo.scale_denom = 8;
    if (full_w) *full_w = cinfo.image_width;
    if (full_h) *full_h = cinfo.image_height;
    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    out.resize(static_cast<size_t>(w) * h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out.data() +
            static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Output-type adapters: float crops get the caller's scale (e.g. 1/255);
// uint8 crops round-to-nearest (scale is ignored — values stay in 0..255,
// matching cv2.warpAffine's uint8 output up to its fixed-point rounding).
inline void store_px(float acc, float scale, float* o) { *o = acc * scale; }
inline void store_px(float acc, float /*scale*/, uint8_t* o) {
    const float v = acc + 0.5f;
    *o = v <= 0.f ? 0 : (v >= 255.f ? 255 : static_cast<uint8_t>(v));
}

inline void invert_affine(const float* M, double* inv) {
    const double a = M[0], b = M[1], c = M[2];
    const double d = M[3], e = M[4], f = M[5];
    const double det = a * e - b * d;
    const double id = det != 0.0 ? 1.0 / det : 0.0;
    inv[0] = e * id;
    inv[1] = -b * id;
    inv[2] = (b * f - e * c) * id;
    inv[3] = -d * id;
    inv[4] = a * id;
    inv[5] = (d * c - a * f) * id;
}

// Border-handling bilinear sample (BORDER_CONSTANT = 0), scalar path.
template <typename OutT>
inline void sample_checked(const uint8_t* src, int sw, int sh,
                           double sx, double sy, float scale, OutT* o) {
    const int x0 = static_cast<int>(std::floor(sx));
    const int y0 = static_cast<int>(std::floor(sy));
    const float fx = static_cast<float>(sx - x0);
    const float fy = static_cast<float>(sy - y0);
    float acc[3] = {0.f, 0.f, 0.f};
    for (int dy2 = 0; dy2 <= 1; ++dy2) {
        const int yy = y0 + dy2;
        if (yy < 0 || yy >= sh) continue;
        const float wy = dy2 ? fy : 1.f - fy;
        for (int dx2 = 0; dx2 <= 1; ++dx2) {
            const int xx = x0 + dx2;
            if (xx < 0 || xx >= sw) continue;
            const float wxy = wy * (dx2 ? fx : 1.f - fx);
            const uint8_t* p = src + (static_cast<size_t>(yy) * sw + xx) * 3;
            acc[0] += wxy * p[0];
            acc[1] += wxy * p[1];
            acc[2] += wxy * p[2];
        }
    }
    store_px(acc[0], scale, o + 0);
    store_px(acc[1], scale, o + 1);
    store_px(acc[2], scale, o + 2);
}

// Bilinear warp into a float32 [0,1] crop from a pre-inverted (dst->src)
// affine. Per output row the source coords are linear in x, so the row is
// split into [border | interior | border]: the interior span (2x2 stencil
// fully inside) runs branch-free in float — the hot path for person crops,
// which are interior for all but a few edge rows.
template <typename OutT>
void warp_one_inv(const uint8_t* src, int sw, int sh, const double* inv,
                  OutT* dst, int dw, int dh, float scale) {
    for (int y = 0; y < dh; ++y) {
        const double sx0 = inv[1] * y + inv[2];
        const double sy0 = inv[4] * y + inv[5];
        // x-interval where sx in [0, sw-2] AND sy in [0, sh-2]
        double xa = 0.0, xb = static_cast<double>(dw);
        auto clip = [&xa, &xb](double a, double b, double hi) {
            if (b > 1e-12) {
                xa = std::max(xa, (0.0 - a) / b);
                xb = std::min(xb, (hi - a) / b);
            } else if (b < -1e-12) {
                xa = std::max(xa, (hi - a) / b);
                xb = std::min(xb, (0.0 - a) / b);
            } else if (a < 0.0 || a > hi) {
                xa = 1.0; xb = 0.0;
            }
        };
        clip(sx0, inv[0], sw - 2.000001);
        clip(sy0, inv[3], sh - 2.000001);
        int xi0 = static_cast<int>(std::ceil(std::max(0.0, xa)));
        int xi1 = static_cast<int>(std::floor(std::min(
            static_cast<double>(dw), xb)));
        if (xi1 < xi0) { xi0 = 0; xi1 = 0; }

        OutT* orow = dst + static_cast<size_t>(y) * dw * 3;
        for (int x = 0; x < xi0; ++x)
            sample_checked(src, sw, sh, inv[0] * x + sx0, inv[3] * x + sy0,
                           scale, orow + x * 3);
        const size_t stride = static_cast<size_t>(sw) * 3;
        for (int x = xi0; x < xi1; ++x) {
            const float sx = static_cast<float>(inv[0] * x + sx0);
            const float sy = static_cast<float>(inv[3] * x + sy0);
            const int x0 = static_cast<int>(sx);
            const int y0 = static_cast<int>(sy);
            const float fx = sx - x0, fy = sy - y0;
            const float w00 = (1.f - fx) * (1.f - fy), w01 = fx * (1.f - fy);
            const float w10 = (1.f - fx) * fy, w11 = fx * fy;
            const uint8_t* p0 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
            const uint8_t* p1 = p0 + stride;
            OutT* o = orow + x * 3;
            store_px(w00 * p0[0] + w01 * p0[3] + w10 * p1[0] + w11 * p1[3],
                     scale, o + 0);
            store_px(w00 * p0[1] + w01 * p0[4] + w10 * p1[1] + w11 * p1[4],
                     scale, o + 1);
            store_px(w00 * p0[2] + w01 * p0[5] + w10 * p1[2] + w11 * p1[5],
                     scale, o + 2);
        }
        for (int x = xi1; x < dw; ++x)
            sample_checked(src, sw, sh, inv[0] * x + sx0, inv[3] * x + sy0,
                           scale, orow + x * 3);
    }
}

template <typename OutT>
void warp_one_u8(const uint8_t* src, int sw, int sh, const float* M,
                 OutT* dst, int dw, int dh, float scale) {
    double inv[6];
    invert_affine(M, inv);
    warp_one_inv(src, sw, sh, inv, dst, dw, dh, scale);
}

// Pick the libjpeg scale_num (of 8) for a dst->src affine: with the crop
// shrinking by s source px per dst px, decoding at ceil(8/s)/8 keeps the
// effective shrink >= 1 while cutting IDCT work by ~s^2. Engaged only for
// s >= 2 so near-native crops keep bit-parity with full decodes.
inline int pick_scale_num(const double* inv) {
    const double rx = std::hypot(inv[0], inv[1]);
    const double ry = std::hypot(inv[3], inv[4]);
    const double shrink = std::min(rx, ry);
    if (shrink < 2.0) return 8;
    int num = static_cast<int>(std::ceil(8.0 / shrink));
    return num < 1 ? 1 : (num > 8 ? 8 : num);
}

template <typename OutT>
int decode_warp_batch_impl(const uint8_t** jpegs, const size_t* sizes, int n,
                           const float* Ms, int dw, int dh, OutT* out,
                           float scale) {
    int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
    for (int i = 0; i < n; ++i) {
        std::vector<uint8_t> img;
        int w = 0, h = 0, full_w = 0, full_h = 0;
        double inv[6];
        invert_affine(Ms + static_cast<size_t>(i) * 6, inv);
        const int snum = pick_scale_num(inv);
        if (decode_one(jpegs[i], sizes[i], img, w, h, snum,
                       &full_w, &full_h) != 0) {
            std::memset(out + static_cast<size_t>(i) * dh * dw * 3, 0,
                        sizeof(OutT) * dh * dw * 3);
            failures += 1;
            continue;
        }
        if (w != full_w || h != full_h) {
            // remap dst->src coords onto the DCT-scaled pixel grid:
            // x_scaled = (x_full + 0.5) * (w/full_w) - 0.5
            const double rx = static_cast<double>(w) / full_w;
            const double ry = static_cast<double>(h) / full_h;
            inv[0] *= rx; inv[1] *= rx; inv[2] = inv[2] * rx + 0.5 * rx - 0.5;
            inv[3] *= ry; inv[4] *= ry; inv[5] = inv[5] * ry + 0.5 * ry - 0.5;
        }
        warp_one_inv(img.data(), w, h, inv,
                     out + static_cast<size_t>(i) * dh * dw * 3, dw, dh,
                     scale);
    }
    return failures;
}

}  // namespace

extern "C" {

// Fused batch pipeline: jpeg bytes -> decode -> warp -> float32 [0,1] crops.
// jpegs: array of n pointers; sizes: n byte counts; Ms: n*6 src->dst
// affines; out: n*dh*dw*3 floats. Returns number of failed decodes.
int decode_warp_batch(const uint8_t** jpegs, const size_t* sizes, int n,
                      const float* Ms, int dw, int dh, float* out,
                      float scale) {
    return decode_warp_batch_impl(jpegs, sizes, n, Ms, dw, dh, out, scale);
}

// Same pipeline, uint8 crops (round-to-nearest): 4x fewer bytes to memcpy
// on host and to ship host->device — normalization happens inside the
// jitted step (core/steps.py::normalize_images handles integer input).
int decode_warp_batch_u8(const uint8_t** jpegs, const size_t* sizes, int n,
                         const float* Ms, int dw, int dh, uint8_t* out) {
    return decode_warp_batch_impl(jpegs, sizes, n, Ms, dw, dh, out, 1.0f);
}

// Decode ONCE, warp TWICE (uint8 out): the self-supervised dual-crop path
// needs a clean teacher crop (Ms1) AND an augmented student crop (Ms2) of
// the same frame — sharing the decode halves the dominant host cost.
// DCT-scaling uses the LESS aggressive of the two affines' shrink factors
// so both crops keep full-decode quality parity. The two crops may have
// different output sizes (half-res teacher crop: the teacher only feeds a
// heatmap argmax, so its crop can shrink — 4x fewer warp pixels and
// host->device bytes for that half of the batch).
int decode_warp2_sized_batch_u8(const uint8_t** jpegs, const size_t* sizes,
                                int n, const float* Ms1, const float* Ms2,
                                int dw1, int dh1, int dw2, int dh2,
                                uint8_t* out1, uint8_t* out2) {
    int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
    for (int i = 0; i < n; ++i) {
        std::vector<uint8_t> img;
        int w = 0, h = 0, full_w = 0, full_h = 0;
        double inv1[6], inv2[6];
        invert_affine(Ms1 + static_cast<size_t>(i) * 6, inv1);
        invert_affine(Ms2 + static_cast<size_t>(i) * 6, inv2);
        const int snum = std::max(pick_scale_num(inv1),
                                  pick_scale_num(inv2));
        uint8_t* o1 = out1 + static_cast<size_t>(i) * dh1 * dw1 * 3;
        uint8_t* o2 = out2 + static_cast<size_t>(i) * dh2 * dw2 * 3;
        if (decode_one(jpegs[i], sizes[i], img, w, h, snum,
                       &full_w, &full_h) != 0) {
            std::memset(o1, 0, static_cast<size_t>(dh1) * dw1 * 3);
            std::memset(o2, 0, static_cast<size_t>(dh2) * dw2 * 3);
            failures += 1;
            continue;
        }
        if (w != full_w || h != full_h) {
            const double rx = static_cast<double>(w) / full_w;
            const double ry = static_cast<double>(h) / full_h;
            for (double* inv : {inv1, inv2}) {
                inv[0] *= rx; inv[1] *= rx;
                inv[2] = inv[2] * rx + 0.5 * rx - 0.5;
                inv[3] *= ry; inv[4] *= ry;
                inv[5] = inv[5] * ry + 0.5 * ry - 0.5;
            }
        }
        warp_one_inv(img.data(), w, h, inv1, o1, dw1, dh1, 1.0f);
        warp_one_inv(img.data(), w, h, inv2, o2, dw2, dh2, 1.0f);
    }
    return failures;
}

int decode_warp2_batch_u8(const uint8_t** jpegs, const size_t* sizes, int n,
                          const float* Ms1, const float* Ms2,
                          int dw, int dh, uint8_t* out1, uint8_t* out2) {
    return decode_warp2_sized_batch_u8(jpegs, sizes, n, Ms1, Ms2,
                                       dw, dh, dw, dh, out1, out2);
}

// Batch warp of pre-decoded uint8 RGB images (all same size).
void warp_batch_u8(const uint8_t* src, int n, int sw, int sh,
                   const float* Ms, int dw, int dh, float* out,
                   float scale) {
#pragma omp parallel for schedule(static)
    for (int i = 0; i < n; ++i) {
        warp_one_u8(src + static_cast<size_t>(i) * sh * sw * 3, sw, sh,
                    Ms + static_cast<size_t>(i) * 6,
                    out + static_cast<size_t>(i) * dh * dw * 3, dw, dh,
                    scale);
    }
}

}  // extern "C"
