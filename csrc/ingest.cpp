// Host-side netCDF ingest accelerator for cae_tools_tpu.
//
// The data layer's host hot path is (a) a NaN + min/max scan over every
// input/output variable and (b) the normalise + NCHW->NHWC transpose pack
// that produces the device-ready batch buffer (see
// cae_tools_tpu/data/dataset.py).  numpy runs these as several separate
// passes over memory; this library fuses each into a single multithreaded
// pass.  Bound via ctypes (no pybind11 in this image); built by
// `make -C csrc` or lazily at import by cae_tools_tpu.native.
//
// The reference library has no native components (SURVEY.md §2.9-bis); this
// is the optional host-ingest accelerator that survey names as the only
// place native code pays off.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int worker_count(int64_t work_items, int64_t min_per_thread) {
    unsigned hw = std::thread::hardware_concurrency();
    if (hw == 0) hw = 4;
    if (hw > 8) hw = 8;  // bandwidth-bound kernels stop scaling early
    int64_t by_work = work_items / min_per_thread;
    if (by_work < 1) by_work = 1;
    return static_cast<int>(std::min<int64_t>(hw, by_work));
}

}  // namespace

extern "C" {

// Fused NaN-count + min/max over a float32 buffer.
void cae_scan_f32(const float* data, int64_t n, float* out_min,
                  float* out_max, int64_t* out_nan_count) {
    int workers = worker_count(n, 1 << 16);
    std::vector<float> mins(workers, INFINITY);
    std::vector<float> maxs(workers, -INFINITY);
    std::vector<int64_t> nans(workers, 0);
    std::vector<std::thread> threads;
    int64_t chunk = (n + workers - 1) / workers;
    for (int t = 0; t < workers; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = std::min<int64_t>(n, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([&, t, lo, hi]() {
            float mn = INFINITY, mx = -INFINITY;
            int64_t nan_count = 0;
            // branch-free: fminf/fmaxf ignore NaN operands, (v != v)
            // counts them — keeps the loop auto-vectorizable
            for (int64_t i = lo; i < hi; ++i) {
                float v = data[i];
                nan_count += (v != v);
                mn = fminf(mn, v);
                mx = fmaxf(mx, v);
            }
            mins[t] = mn;
            maxs[t] = mx;
            nans[t] = nan_count;
        });
    }
    for (auto& th : threads) th.join();
    float mn = INFINITY, mx = -INFINITY;
    int64_t nan_count = 0;
    for (int t = 0; t < workers; ++t) {
        if (mins[t] < mn) mn = mins[t];
        if (maxs[t] > mx) mx = maxs[t];
        nan_count += nans[t];
    }
    *out_min = mn;
    *out_max = mx;
    *out_nan_count = nan_count;
}

// Normalise ((v - lo) * inv_range) an NCHW float32 variable and scatter it
// into an NHWC destination at channel offset c_off (fusing the per-variable
// channel concat).  Zero-range variables write 0 (inv_range passed as 0).
void cae_normalize_pack_nchw_to_nhwc(const float* src, float* dst, int64_t n,
                                     int64_t c, int64_t h, int64_t w,
                                     float lo, float inv_range, int64_t c_off,
                                     int64_t c_total) {
    int workers = worker_count(n * c * h, 1 << 12);
    std::vector<std::thread> threads;
    int64_t rows = n * c * h;  // one src row = w contiguous floats
    int64_t chunk = (rows + workers - 1) / workers;
    for (int t = 0; t < workers; ++t) {
        int64_t lo_row = t * chunk;
        int64_t hi_row = std::min<int64_t>(rows, lo_row + chunk);
        if (lo_row >= hi_row) break;
        threads.emplace_back([=]() {
            for (int64_t row = lo_row; row < hi_row; ++row) {
                int64_t hi_idx = row % h;
                int64_t ci = (row / h) % c;
                int64_t ni = row / (h * c);
                const float* s = src + ((ni * c + ci) * h + hi_idx) * w;
                float* d =
                    dst + ((ni * h + hi_idx) * w) * c_total + (c_off + ci);
                for (int64_t x = 0; x < w; ++x) {
                    d[x * c_total] = (s[x] - lo) * inv_range;
                }
            }
        });
    }
    for (auto& th : threads) th.join();
}

// Plain NHWC pack without normalisation (inv_range = 1, lo = 0 fast path).
void cae_pack_nchw_to_nhwc(const float* src, float* dst, int64_t n, int64_t c,
                           int64_t h, int64_t w, int64_t c_off,
                           int64_t c_total) {
    cae_normalize_pack_nchw_to_nhwc(src, dst, n, c, h, w, 0.0f, 1.0f, c_off,
                                    c_total);
}

}  // extern "C"
