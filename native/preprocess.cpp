// Native host-side preprocessing for aidet_tpu.
//
// The reference's input path is torch DataLoader workers doing
// numpy/cv2 per-image work; at the 1000-patches/s target the host
// becomes the bottleneck.  This library fuses the per-patch tail of
// the pipeline — BGR→RGB, float conversion, mean/std normalisation,
// zero-padding — and the scene tiler into single multi-threaded
// passes over the data (one read, one write, OpenMP across rows),
// exposed through a plain C ABI for ctypes.
//
// Build: make -C native   (produces libaidet_preproc.so)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// uint8 HWC (BGR) → float32 [out_h, out_w, 3] (RGB), normalised and
// zero-padded.  src is h×w×3, dst is out_h×out_w×3 with h<=out_h,
// w<=out_w.  mean/std are per-RGB-channel.
void normalize_pad(const uint8_t* src, int h, int w,
                   float* dst, int out_h, int out_w,
                   const float* mean, const float* std_,
                   int to_rgb) {
    const float inv0 = 1.0f / std_[0];
    const float inv1 = 1.0f / std_[1];
    const float inv2 = 1.0f / std_[2];
    #pragma omp parallel for schedule(static)
    for (int y = 0; y < out_h; ++y) {
        float* drow = dst + (size_t)y * out_w * 3;
        if (y >= h) {
            std::memset(drow, 0, sizeof(float) * (size_t)out_w * 3);
            continue;
        }
        const uint8_t* srow = src + (size_t)y * w * 3;
        int x = 0;
        for (; x < w; ++x) {
            const uint8_t* p = srow + x * 3;
            float c0, c1, c2;  // RGB order after optional swap
            if (to_rgb) { c0 = p[2]; c1 = p[1]; c2 = p[0]; }
            else        { c0 = p[0]; c1 = p[1]; c2 = p[2]; }
            float* q = drow + x * 3;
            q[0] = (c0 - mean[0]) * inv0;
            q[1] = (c1 - mean[1]) * inv1;
            q[2] = (c2 - mean[2]) * inv2;
        }
        if (w < out_w)
            std::memset(drow + (size_t)w * 3, 0,
                        sizeof(float) * (size_t)(out_w - w) * 3);
    }
}

// Batched variant: n images with identical geometry, contiguous src
// (n×h×w×3 uint8) → dst (n×out_h×out_w×3 f32).
void normalize_pad_batch(const uint8_t* src, int n, int h, int w,
                         float* dst, int out_h, int out_w,
                         const float* mean, const float* std_,
                         int to_rgb) {
    #pragma omp parallel for schedule(dynamic, 1)
    for (int i = 0; i < n; ++i) {
        normalize_pad(src + (size_t)i * h * w * 3, h, w,
                      dst + (size_t)i * out_h * out_w * 3,
                      out_h, out_w, mean, std_, to_rgb);
    }
}

// Scene tiler: scene (H×W×3 uint8) → n_patches×patch×patch×3 uint8,
// zero-padded at borders. offsets must hold 2*n_patches ints (x, y).
void tile_scene(const uint8_t* scene, int H, int W,
                uint8_t* patches, const int32_t* offsets, int n_patches,
                int patch) {
    #pragma omp parallel for schedule(dynamic, 1)
    for (int i = 0; i < n_patches; ++i) {
        const int ox = offsets[2 * i];
        const int oy = offsets[2 * i + 1];
        uint8_t* dst = patches + (size_t)i * patch * patch * 3;
        const int copy_h = std::max(0, std::min(patch, H - oy));
        const int copy_w = std::max(0, std::min(patch, W - ox));
        for (int y = 0; y < patch; ++y) {
            uint8_t* drow = dst + (size_t)y * patch * 3;
            if (y >= copy_h) {
                std::memset(drow, 0, (size_t)patch * 3);
                continue;
            }
            const uint8_t* srow =
                scene + ((size_t)(oy + y) * W + ox) * 3;
            std::memcpy(drow, srow, (size_t)copy_w * 3);
            if (copy_w < patch)
                std::memset(drow + (size_t)copy_w * 3, 0,
                            (size_t)(patch - copy_w) * 3);
        }
    }
}

// Fused tile + normalize: scene uint8 → f32 normalised patches.
void tile_scene_normalized(const uint8_t* scene, int H, int W,
                           float* patches, const int32_t* offsets,
                           int n_patches, int patch,
                           const float* mean, const float* std_,
                           int to_rgb) {
    const float inv0 = 1.0f / std_[0];
    const float inv1 = 1.0f / std_[1];
    const float inv2 = 1.0f / std_[2];
    #pragma omp parallel for schedule(dynamic, 1)
    for (int i = 0; i < n_patches; ++i) {
        const int ox = offsets[2 * i];
        const int oy = offsets[2 * i + 1];
        float* dst = patches + (size_t)i * patch * patch * 3;
        const int copy_h = std::max(0, std::min(patch, H - oy));
        const int copy_w = std::max(0, std::min(patch, W - ox));
        for (int y = 0; y < patch; ++y) {
            float* drow = dst + (size_t)y * patch * 3;
            if (y >= copy_h) {
                std::memset(drow, 0, sizeof(float) * (size_t)patch * 3);
                continue;
            }
            const uint8_t* srow =
                scene + ((size_t)(oy + y) * W + ox) * 3;
            for (int x = 0; x < copy_w; ++x) {
                const uint8_t* p = srow + x * 3;
                float c0, c1, c2;
                if (to_rgb) { c0 = p[2]; c1 = p[1]; c2 = p[0]; }
                else        { c0 = p[0]; c1 = p[1]; c2 = p[2]; }
                float* q = drow + x * 3;
                q[0] = (c0 - mean[0]) * inv0;
                q[1] = (c1 - mean[1]) * inv1;
                q[2] = (c2 - mean[2]) * inv2;
            }
            if (copy_w < patch)
                std::memset(drow + (size_t)copy_w * 3, 0,
                            sizeof(float) * (size_t)(patch - copy_w) * 3);
        }
    }
}

}  // extern "C"
