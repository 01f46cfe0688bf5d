// Native runtime components for relightable3dgaussians-w-tpu.
//
// The reference keeps its runtime hot paths in C++/CUDA (COLMAP parsing feeds from
// python, but simple-knn is a CUDA extension, submodules/simple-knn/simple_knn.cu).
// On TPU the device compute is Pallas/XLA; the host-side runtime pieces that are
// genuinely hot live here:
//   * colmap_read_points3d: points3D.bin has variable-length track records, so numpy
//     cannot vectorize it; Trevi-scale reconstructions carry millions of points.
//   * knn_mean_dist2: exact mean squared 3-NN distance via Morton-sorted windowed
//     search with full correctness fallback (grows the window until the k-th best
//     cannot be beaten outside it) — the simple-knn equivalent, OpenMP-parallel.
//
// Plain C ABI (no pybind11 in this environment); loaded with ctypes from
// relightable3dgaussians_w_tpu/native.py, which falls back to pure-python
// implementations when the library is absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ------------------------------------------------------------------ colmap points3D

// Returns number of points parsed, or -1 on error. Caller passes buffers sized via
// colmap_count_points3d.
long long colmap_count_points3d(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    uint64_t n = 0;
    if (std::fread(&n, 8, 1, f) != 1) { std::fclose(f); return -1; }
    std::fclose(f);
    return (long long)n;
}

long long colmap_read_points3d(const char* path, double* xyz, uint8_t* rgb,
                               double* err, long long capacity) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    uint64_t n = 0;
    if (std::fread(&n, 8, 1, f) != 1) { std::fclose(f); return -1; }
    if ((long long)n > capacity) { std::fclose(f); return -1; }
    // Record: u64 id, 3x f64 xyz, 3x u8 rgb, f64 error, u64 track_len, track_len * 8B.
    std::vector<unsigned char> buf(1 << 20);
    for (uint64_t i = 0; i < n; ++i) {
        unsigned char head[8 + 24 + 3 + 8 + 8];
        if (std::fread(head, sizeof(head), 1, f) != 1) { std::fclose(f); return -1; }
        std::memcpy(xyz + 3 * i, head + 8, 24);
        std::memcpy(rgb + 3 * i, head + 32, 3);
        std::memcpy(err + i, head + 35, 8);
        uint64_t track = 0;
        std::memcpy(&track, head + 43, 8);
        if (std::fseek(f, (long)(track * 8), SEEK_CUR) != 0) { std::fclose(f); return -1; }
    }
    std::fclose(f);
    return (long long)n;
}

// ------------------------------------------------------------------------- 3-NN

static inline uint32_t expand_bits(uint32_t v) {
    v = (v | (v << 16)) & 0x030000FFu;
    v = (v | (v << 8)) & 0x0300F00Fu;
    v = (v | (v << 4)) & 0x030C30C3u;
    v = (v | (v << 2)) & 0x09249249u;
    return v;
}

// Mean squared distance to the k nearest neighbors, exact.
// points: [n, 3] float32; out: [n] float32.
int knn_mean_dist2(const float* points, long long n, int k, float* out) {
    if (n <= 1) { for (long long i = 0; i < n; ++i) out[i] = 0.f; return 0; }
    float lo[3] = {points[0], points[1], points[2]};
    float hi[3] = {points[0], points[1], points[2]};
    for (long long i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d) {
            lo[d] = std::min(lo[d], points[3 * i + d]);
            hi[d] = std::max(hi[d], points[3 * i + d]);
        }
    float span[3];
    for (int d = 0; d < 3; ++d) span[d] = std::max(hi[d] - lo[d], 1e-9f);

    struct Entry { uint32_t code; int32_t idx; };
    std::vector<Entry> order((size_t)n);
#pragma omp parallel for schedule(static)
    for (long long i = 0; i < n; ++i) {
        uint32_t q[3];
        for (int d = 0; d < 3; ++d) {
            float t = (points[3 * i + d] - lo[d]) / span[d];
            q[d] = (uint32_t)std::min(1023.f, std::max(0.f, t * 1023.f));
        }
        order[(size_t)i] = {expand_bits(q[0]) | (expand_bits(q[1]) << 1) |
                           (expand_bits(q[2]) << 2), (int32_t)i};
    }
    std::sort(order.begin(), order.end(),
              [](const Entry& a, const Entry& b) { return a.code < b.code; });

    const int kk = (int)std::min<long long>(k, n - 1);

    // Box-pruned exact search, mirroring the reference's design
    // (simple_knn.cu:78-183): boxes of BOX consecutive Morton-sorted points carry
    // their bbox; a box is scanned only if its bbox could beat the current k-th
    // best. A +/-WARM Morton window seeds the candidates first.
    constexpr long long BOX = 256;
    const long long n_boxes = (n + BOX - 1) / BOX;
    std::vector<float> box_lo(3 * (size_t)n_boxes), box_hi(3 * (size_t)n_boxes);
#pragma omp parallel for schedule(static)
    for (long long b = 0; b < n_boxes; ++b) {
        float blo[3] = {1e30f, 1e30f, 1e30f}, bhi[3] = {-1e30f, -1e30f, -1e30f};
        const long long e = std::min(n, (b + 1) * BOX);
        for (long long j = b * BOX; j < e; ++j) {
            const float* q = points + 3 * order[(size_t)j].idx;
            for (int d = 0; d < 3; ++d) {
                blo[d] = std::min(blo[d], q[d]);
                bhi[d] = std::max(bhi[d], q[d]);
            }
        }
        for (int d = 0; d < 3; ++d) {
            box_lo[3 * (size_t)b + d] = blo[d];
            box_hi[3 * (size_t)b + d] = bhi[d];
        }
    }

#pragma omp parallel for schedule(dynamic, 256)
    for (long long s = 0; s < n; ++s) {
        const int32_t i = order[(size_t)s].idx;
        const float* p = points + 3 * i;
        float best[8];
        for (int j = 0; j < kk; ++j) best[j] = 1e30f;
        auto consider = [&](long long j) {
            if (j == s) return;
            const float* q = points + 3 * order[(size_t)j].idx;
            float dx = q[0] - p[0], dy = q[1] - p[1], dz = q[2] - p[2];
            float d2 = dx * dx + dy * dy + dz * dz;
            if (d2 < best[kk - 1]) {
                int ins = kk - 1;
                while (ins > 0 && best[ins - 1] > d2) { best[ins] = best[ins - 1]; --ins; }
                best[ins] = d2;
            }
        };
        // Seed from the point's own Morton box, then prune the rest.
        const long long own = s / BOX;
        {
            const long long e = std::min(n, (own + 1) * BOX);
            for (long long j = own * BOX; j < e; ++j) consider(j);
        }
        for (long long b = 0; b < n_boxes; ++b) {
            if (b == own) continue;
            float d2 = 0.f;
            for (int d = 0; d < 3; ++d) {
                float lo_d = box_lo[3 * (size_t)b + d], hi_d = box_hi[3 * (size_t)b + d];
                float diff = (p[d] < lo_d) ? lo_d - p[d] : (p[d] > hi_d ? p[d] - hi_d : 0.f);
                d2 += diff * diff;
            }
            if (d2 > best[kk - 1]) continue;
            const long long e = std::min(n, (b + 1) * BOX);
            for (long long j = b * BOX; j < e; ++j) consider(j);
        }
        float sum = 0.f;
        for (int j = 0; j < kk; ++j) sum += best[j];
        out[i] = sum / kk;
    }
    return 0;
}

}  // extern "C"
