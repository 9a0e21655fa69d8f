// prometheus_io: native data-plane kernels for the host input/output pipeline.
//
// The reference delegates its host-side hot loops to external native code
// (torch DataLoader workers, PIL-SIMD/DALI decode paths, CUDA wheels). This
// library provides the TPU framework's equivalents as dependency-free C++
// exposed over a C ABI (ctypes):
//
//   - center_crop_resize_normalize: uint8 HWC -> central-square crop ->
//     bilinear resize -> float32 CHW in [-1, 1]  (the per-frame transform on
//     the training input path)
//   - encode_splat: pack gaussians into antimatter15 .splat records, sorted
//     by volume x opacity (export hot loop: ~0.5M records per scene)
//   - u8_to_chw_f32: plain layout+normalize for pre-sized frames
//
// Build: cc -O3 -shared -fPIC (see build.py); loaded via ctypes with a
// pure-numpy fallback when the compiler or artifact is unavailable.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// uint8 HWC (h, w, 3) -> central square crop -> bilinear resize to
// (out_size, out_size) -> float32 CHW in [-1, 1].
// Returns 0 on success.
int center_crop_resize_normalize(const uint8_t* src, int h, int w,
                                 int out_size, float* dst) {
    if (h <= 0 || w <= 0 || out_size <= 0) return 1;
    const int s = h < w ? h : w;
    const int top = (h - s) / 2;
    const int left = (w - s) / 2;
    const float scale = static_cast<float>(s) / out_size;
    const int plane = out_size * out_size;

    for (int oy = 0; oy < out_size; ++oy) {
        // align sample positions with pixel centers (PIL convention)
        float fy = (oy + 0.5f) * scale - 0.5f;
        if (fy < 0) fy = 0;
        int y0 = static_cast<int>(fy);
        int y1 = y0 + 1 < s ? y0 + 1 : s - 1;
        float wy = fy - y0;
        const uint8_t* row0 = src + ((top + y0) * w + left) * 3;
        const uint8_t* row1 = src + ((top + y1) * w + left) * 3;
        for (int ox = 0; ox < out_size; ++ox) {
            float fx = (ox + 0.5f) * scale - 0.5f;
            if (fx < 0) fx = 0;
            int x0 = static_cast<int>(fx);
            int x1 = x0 + 1 < s ? x0 + 1 : s - 1;
            float wx = fx - x0;
            const int o = oy * out_size + ox;
            for (int c = 0; c < 3; ++c) {
                float v00 = row0[x0 * 3 + c], v01 = row0[x1 * 3 + c];
                float v10 = row1[x0 * 3 + c], v11 = row1[x1 * 3 + c];
                float v = (1 - wy) * ((1 - wx) * v00 + wx * v01)
                        + wy * ((1 - wx) * v10 + wx * v11);
                dst[c * plane + o] = v * (1.0f / 127.5f) - 1.0f;
            }
        }
    }
    return 0;
}

// uint8 HWC -> float32 CHW in [-1, 1] (no resize).
int u8_to_chw_f32(const uint8_t* src, int h, int w, float* dst) {
    const int plane = h * w;
    for (int i = 0; i < plane; ++i) {
        dst[i] = src[i * 3] * (1.0f / 127.5f) - 1.0f;
        dst[plane + i] = src[i * 3 + 1] * (1.0f / 127.5f) - 1.0f;
        dst[2 * plane + i] = src[i * 3 + 2] * (1.0f / 127.5f) - 1.0f;
    }
    return 0;
}

// Pack n gaussians into 32-byte .splat records, sorted descending by
// volume * opacity. Inputs are activated values. out must hold 32*n bytes.
// Returns the number of records written (after opacity pruning).
int encode_splat(const float* xyz, const float* rgb, const float* opacity,
                 const float* scales, const float* rots, int n,
                 float opacity_threshold, uint8_t* out) {
    const float SH_C0 = 0.28209479177387814f;
    std::vector<int> order;
    order.reserve(n);
    std::vector<float> keys(n);
    for (int i = 0; i < n; ++i) {
        if (opacity[i] >= opacity_threshold) {
            keys[i] = scales[i * 3] * scales[i * 3 + 1] * scales[i * 3 + 2]
                    * opacity[i];
            order.push_back(i);
        }
    }
    std::sort(order.begin(), order.end(),
              [&](int a, int b) { return keys[a] > keys[b]; });

    uint8_t* p = out;
    for (int idx : order) {
        std::memcpy(p, xyz + idx * 3, 12);
        std::memcpy(p + 12, scales + idx * 3, 12);
        for (int c = 0; c < 3; ++c) {
            float v = (0.5f + SH_C0 * rgb[idx * 3 + c]) * 255.0f;
            p[24 + c] = static_cast<uint8_t>(std::min(std::max(v, 0.f), 255.f));
        }
        float a = opacity[idx] * 255.0f;
        p[27] = static_cast<uint8_t>(std::min(std::max(a, 0.f), 255.f));
        float norm = 0.f;
        for (int c = 0; c < 4; ++c) norm += rots[idx * 4 + c] * rots[idx * 4 + c];
        norm = std::sqrt(std::max(norm, 1e-12f));
        for (int c = 0; c < 4; ++c) {
            float q = rots[idx * 4 + c] / norm * 128.0f + 128.0f;
            p[28 + c] = static_cast<uint8_t>(std::min(std::max(q, 0.f), 255.f));
        }
        p += 32;
    }
    return static_cast<int>(order.size());
}

}  // extern "C"
