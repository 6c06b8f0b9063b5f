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
int decode_one(const uint8_t* buf, size_t size, std::vector<uint8_t>& out,
               int& w, int& h) {
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

// Bilinear warp of one RGB uint8 image into a float32 [0,1] crop.
void warp_one_u8(const uint8_t* src, int sw, int sh, const float* M,
                 float* dst, int dw, int dh, float scale) {
    double inv[6];
    invert_affine(M, inv);
    for (int y = 0; y < dh; ++y) {
        for (int x = 0; x < dw; ++x) {
            const double sx = inv[0] * x + inv[1] * y + inv[2];
            const double sy = inv[3] * x + inv[4] * y + inv[5];
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
                    const uint8_t* p =
                        src + (static_cast<size_t>(yy) * sw + xx) * 3;
                    acc[0] += wxy * p[0];
                    acc[1] += wxy * p[1];
                    acc[2] += wxy * p[2];
                }
            }
            float* o = dst + (static_cast<size_t>(y) * dw + x) * 3;
            o[0] = acc[0] * scale;
            o[1] = acc[1] * scale;
            o[2] = acc[2] * scale;
        }
    }
}

}  // namespace

extern "C" {

// Fused batch pipeline: jpeg bytes -> decode -> warp -> float32 [0,1] crops.
// jpegs: array of n pointers; sizes: n byte counts; Ms: n*6 src->dst
// affines; out: n*dh*dw*3 floats. Returns number of failed decodes.
int decode_warp_batch(const uint8_t** jpegs, const size_t* sizes, int n,
                      const float* Ms, int dw, int dh, float* out,
                      float scale) {
    int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
    for (int i = 0; i < n; ++i) {
        std::vector<uint8_t> img;
        int w = 0, h = 0;
        if (decode_one(jpegs[i], sizes[i], img, w, h) != 0) {
            std::memset(out + static_cast<size_t>(i) * dh * dw * 3, 0,
                        sizeof(float) * dh * dw * 3);
            failures += 1;
            continue;
        }
        warp_one_u8(img.data(), w, h, Ms + static_cast<size_t>(i) * 6,
                    out + static_cast<size_t>(i) * dh * dw * 3, dw, dh,
                    scale);
    }
    return failures;
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

// Decode a batch of JPEGs into caller-provided fixed-capacity buffers.
// outs: n * (max_h*max_w*3) uint8; dims: n*2 (w, h). Returns failures.
int decode_batch(const uint8_t** jpegs, const size_t* sizes, int n,
                 uint8_t* outs, int max_w, int max_h, int* dims) {
    int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
    for (int i = 0; i < n; ++i) {
        std::vector<uint8_t> img;
        int w = 0, h = 0;
        if (decode_one(jpegs[i], sizes[i], img, w, h) != 0 ||
            w > max_w || h > max_h) {
            dims[i * 2] = 0;
            dims[i * 2 + 1] = 0;
            failures += 1;
            continue;
        }
        dims[i * 2] = w;
        dims[i * 2 + 1] = h;
        uint8_t* dst = outs + static_cast<size_t>(i) * max_h * max_w * 3;
        for (int y = 0; y < h; ++y)
            std::memcpy(dst + static_cast<size_t>(y) * max_w * 3,
                        img.data() + static_cast<size_t>(y) * w * 3,
                        static_cast<size_t>(w) * 3);
    }
    return failures;
}

}  // extern "C"
