// Native framebuffer runtime: float64 sample accumulation, sRGB tonemap,
// and asynchronous checkpointing.
//
// TPU-native equivalent of the reference's host-side runtime around the
// render kernel: the Framebuffer store (reference src/framebuffer.{hpp,cpp})
// plus the per-pixel f64 accumulation the reference does inline in
// Renderer::_render_pixel (reference src/renderer.cpp:287-296).  The device
// produces per-chunk f32 partial sums; this module owns the long-lived f64
// state, does the final XYZ->sRGB conversion with the exact piecewise gamma
// (reference src/util/color.hpp:84-97), and writes checkpoints on a
// background thread so IO never stalls the render loop.
//
// C ABI for ctypes; no Python/pybind dependency.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Framebuffer {
    uint32_t width = 0, height = 0;
    std::vector<double> sum_value;  // [n_px * 3] XYZ or lRGB sums
    std::vector<double> sum_alpha;  // [n_px]
    uint64_t spp_done = 0;
    std::mutex mu;                   // guards sums + spp_done
    std::thread writer;              // in-flight async checkpoint
    std::atomic<int> writer_active{0};
    std::atomic<int> last_write_ok{1};

    ~Framebuffer() {
        if (writer.joinable()) writer.join();
    }
};

constexpr uint32_t kCkptMagic = 0x53534642u;  // "SSFB"
constexpr uint32_t kCkptVersion = 1;

bool write_checkpoint_file(const char* path, uint32_t w, uint32_t h,
                           uint64_t spp, const std::vector<double>& value,
                           const std::vector<double>& alpha) {
    std::string tmp = std::string(path) + ".tmp";
    FILE* f = std::fopen(tmp.c_str(), "wb");
    if (!f) return false;
    bool ok = true;
    ok &= std::fwrite(&kCkptMagic, 4, 1, f) == 1;
    ok &= std::fwrite(&kCkptVersion, 4, 1, f) == 1;
    ok &= std::fwrite(&w, 4, 1, f) == 1;
    ok &= std::fwrite(&h, 4, 1, f) == 1;
    ok &= std::fwrite(&spp, 8, 1, f) == 1;
    ok &= std::fwrite(value.data(), sizeof(double), value.size(), f) == value.size();
    ok &= std::fwrite(alpha.data(), sizeof(double), alpha.size(), f) == alpha.size();
    ok &= std::fclose(f) == 0;
    if (ok) ok = std::rename(tmp.c_str(), path) == 0;
    return ok;
}

inline float srgb_gamma(float l) {
    // exact sRGB piecewise transfer (reference src/util/color.hpp:84-90)
    return l < 0.0031308f ? 12.92f * l
                          : 1.055f * std::pow(l, 1.0f / 2.4f) - 0.055f;
}

}  // namespace

extern "C" {

void* ssfb_create(uint32_t width, uint32_t height) {
    auto* fb = new Framebuffer;
    fb->width = width;
    fb->height = height;
    fb->sum_value.assign(size_t(width) * height * 3, 0.0);
    fb->sum_alpha.assign(size_t(width) * height, 0.0);
    return fb;
}

void ssfb_destroy(void* h) { delete static_cast<Framebuffer*>(h); }

// Accumulate a chunk of per-pixel f32 partial sums produced by the device.
// value3: f32[count*3] (row-major per pixel), alpha: f32[count].
void ssfb_add_chunk(void* h, uint64_t offset, uint64_t count,
                    const float* value3, const float* alpha) {
    auto* fb = static_cast<Framebuffer*>(h);
    std::lock_guard<std::mutex> lock(fb->mu);
    double* v = fb->sum_value.data() + offset * 3;
    double* a = fb->sum_alpha.data() + offset;
    for (uint64_t i = 0; i < count; ++i) {
        v[i * 3 + 0] += double(value3[i * 3 + 0]);
        v[i * 3 + 1] += double(value3[i * 3 + 1]);
        v[i * 3 + 2] += double(value3[i * 3 + 2]);
        a[i] += double(alpha[i]);
    }
}

void ssfb_note_pass(void* h, uint32_t pass_spp) {
    auto* fb = static_cast<Framebuffer*>(h);
    std::lock_guard<std::mutex> lock(fb->mu);
    fb->spp_done += pass_spp;
}

uint64_t ssfb_spp_done(void* h) {
    auto* fb = static_cast<Framebuffer*>(h);
    std::lock_guard<std::mutex> lock(fb->mu);
    return fb->spp_done;
}

// Mean value/alpha into caller-provided buffers (f64[n_px*3], f64[n_px]).
void ssfb_mean(void* h, double* out_value3, double* out_alpha) {
    auto* fb = static_cast<Framebuffer*>(h);
    std::lock_guard<std::mutex> lock(fb->mu);
    const double inv = fb->spp_done ? 1.0 / double(fb->spp_done) : 0.0;
    const size_t n = fb->sum_alpha.size();
    for (size_t i = 0; i < n * 3; ++i) out_value3[i] = fb->sum_value[i] * inv;
    for (size_t i = 0; i < n; ++i) out_alpha[i] = fb->sum_alpha[i] * inv;
}

// Tonemap: mean value -> (3x3 matrix) -> sRGB gamma -> u8 RGBA.
// matrix: f32[9] row-major (identity for rgb mode, XYZ->lRGB otherwise).
// flip_rows != 0 writes scanlines top-to-bottom (PNG order; the internal
// layout is bottom-to-top like the reference framebuffer).
void ssfb_tonemap_srgb_u8(void* h, const float* matrix, int flip_rows,
                          uint8_t* out_rgba) {
    auto* fb = static_cast<Framebuffer*>(h);
    std::lock_guard<std::mutex> lock(fb->mu);
    const double inv = fb->spp_done ? 1.0 / double(fb->spp_done) : 0.0;
    const uint32_t w = fb->width, hgt = fb->height;
    for (uint32_t j = 0; j < hgt; ++j) {
        const uint32_t src_row = j;
        const uint32_t dst_row = flip_rows ? (hgt - 1 - j) : j;
        const double* v = fb->sum_value.data() + size_t(src_row) * w * 3;
        const double* a = fb->sum_alpha.data() + size_t(src_row) * w;
        uint8_t* o = out_rgba + size_t(dst_row) * w * 4;
        for (uint32_t i = 0; i < w; ++i) {
            float x = float(v[i * 3 + 0] * inv);
            float y = float(v[i * 3 + 1] * inv);
            float z = float(v[i * 3 + 2] * inv);
            float r = matrix[0] * x + matrix[1] * y + matrix[2] * z;
            float g = matrix[3] * x + matrix[4] * y + matrix[5] * z;
            float b = matrix[6] * x + matrix[7] * y + matrix[8] * z;
            float pix[4] = {srgb_gamma(r), srgb_gamma(g), srgb_gamma(b),
                            float(a[i] * inv)};
            for (int c = 0; c < 4; ++c) {
                float val = pix[c] * 255.0f + 0.5f;
                o[i * 4 + c] =
                    uint8_t(val < 0.f ? 0.f : (val > 255.f ? 255.f : val));
            }
        }
    }
}

// Start an asynchronous checkpoint write (snapshot under the lock, write on
// a background thread).  Returns 0 if a write is already in flight.
int ssfb_checkpoint_async(void* h, const char* path) {
    auto* fb = static_cast<Framebuffer*>(h);
    if (fb->writer_active.exchange(1)) return 0;
    if (fb->writer.joinable()) fb->writer.join();
    std::vector<double> value, alpha;
    uint64_t spp;
    uint32_t w, hgt;
    {
        std::lock_guard<std::mutex> lock(fb->mu);
        value = fb->sum_value;  // snapshot
        alpha = fb->sum_alpha;
        spp = fb->spp_done;
        w = fb->width;
        hgt = fb->height;
    }
    std::string p(path);
    fb->writer = std::thread([fb, p, w, hgt, spp, value = std::move(value),
                              alpha = std::move(alpha)]() {
        fb->last_write_ok.store(
            write_checkpoint_file(p.c_str(), w, hgt, spp, value, alpha) ? 1 : 0);
        fb->writer_active.store(0);
    });
    return 1;
}

// Block until any in-flight checkpoint write finishes; returns last status.
int ssfb_checkpoint_wait(void* h) {
    auto* fb = static_cast<Framebuffer*>(h);
    if (fb->writer.joinable()) fb->writer.join();
    return fb->last_write_ok.load();
}

// Synchronous load; returns 1 on success (dimensions must match).
int ssfb_checkpoint_load(void* h, const char* path) {
    auto* fb = static_cast<Framebuffer*>(h);
    FILE* f = std::fopen(path, "rb");
    if (!f) return 0;
    uint32_t magic = 0, version = 0, w = 0, hgt = 0;
    uint64_t spp = 0;
    bool ok = std::fread(&magic, 4, 1, f) == 1 && magic == kCkptMagic &&
              std::fread(&version, 4, 1, f) == 1 && version == kCkptVersion &&
              std::fread(&w, 4, 1, f) == 1 && std::fread(&hgt, 4, 1, f) == 1 &&
              std::fread(&spp, 8, 1, f) == 1 && w == fb->width &&
              hgt == fb->height;
    if (ok) {
        std::lock_guard<std::mutex> lock(fb->mu);
        ok &= std::fread(fb->sum_value.data(), sizeof(double),
                         fb->sum_value.size(), f) == fb->sum_value.size();
        ok &= std::fread(fb->sum_alpha.data(), sizeof(double),
                         fb->sum_alpha.size(), f) == fb->sum_alpha.size();
        if (ok) fb->spp_done = spp;
    }
    std::fclose(f);
    return ok ? 1 : 0;
}

}  // extern "C"
