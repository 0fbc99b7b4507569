// Native serving hot-loop primitives (see native/__init__.py).
//
// The reference's serving path leans on native third-party code for its
// per-frame audio work (sphn's Rust opus + torch ops); here the per-frame
// host work — pcm16 conversion, Hamming cross-fades, frame packing — is
// first-party C++, compiled once at import with the system toolchain and
// loaded via ctypes (no pybind11 dependency).
//
// All functions are plain C ABI, operate on caller-owned buffers, and are
// safe to call from multiple sessions concurrently (no global state).

#include <cstdint>
#include <cstring>

extern "C" {

// float [-1,1] -> int16 little-endian with clipping
void pcm16_from_float(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float x = in[i];
        if (x > 1.0f) x = 1.0f;
        if (x < -1.0f) x = -1.0f;
        out[i] = (int16_t)(x * 32767.0f);
    }
}

void float_from_pcm16(const int16_t* in, int64_t n, float* out) {
    const float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * k;
}

// head[i] = head[i] * win_in[i] + tail[i] * win_out[i]   (flow_inference
// fade_in_out semantics over the overlap region)
void crossfade(float* head, const float* tail, const float* win_in,
               const float* win_out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        head[i] = head[i] * win_in[i] + tail[i] * win_out[i];
    }
}

// Append src to a ring buffer of capacity cap at write position *w_pos
// (in samples, modulo cap).  Returns new write position.
int64_t ring_write(float* ring, int64_t cap, int64_t w_pos,
                   const float* src, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        ring[(w_pos + i) % cap] = src[i];
    }
    return (w_pos + n) % cap;
}

// Copy n samples from ring starting at r_pos into dst.
void ring_read(const float* ring, int64_t cap, int64_t r_pos, float* dst,
               int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        dst[i] = ring[(r_pos + i) % cap];
    }
}

}  // extern "C"
