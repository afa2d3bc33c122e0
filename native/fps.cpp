// Batched farthest-point sampling for host-side dataset preparation.
//
// The reference delegates FPS to an external CUDA package for its offline
// downsampling tools (/root/reference/dataset/point_ops.py:23,
// dataset/downsampling_pcd.py:5). On this side the device path is the
// jitted JAX kernel (pcdiff/geometry/fps.py); this native version serves
// the host-side data-prep paths (MVP precache, downsample CLI) where
// round-tripping every chunk through the accelerator is wasteful.
//
// Semantics match pcdiff.geometry.fps.farthest_point_sample with
// deterministic=True exactly: the caller supplies each batch element's start
// index, the min-distance table is updated with squared L2, and the next
// centroid is the FIRST argmax (jnp.argmax tie-breaking).

#include <cfloat>
#include <cstdint>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// points: [B, N, C] float32 row-major; starts: [B] int32; out_idx: [B, M].
void fps_batch(const float* points, int32_t B, int32_t N, int32_t C,
               int32_t M, const int32_t* starts, int32_t* out_idx) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
    for (int32_t b = 0; b < B; ++b) {
        const float* pts = points + (int64_t)b * N * C;
        int32_t* idx = out_idx + (int64_t)b * M;
        float* dist = new float[N];
        for (int32_t i = 0; i < N; ++i) dist[i] = FLT_MAX;

        int32_t farthest = starts[b] % N;
        for (int32_t m = 0; m < M; ++m) {
            idx[m] = farthest;
            const float* c = pts + (int64_t)farthest * C;
            float best = -FLT_MAX;
            int32_t best_i = 0;
            for (int32_t i = 0; i < N; ++i) {
                const float* p = pts + (int64_t)i * C;
                float d = 0.0f;
                for (int32_t k = 0; k < C; ++k) {
                    float diff = p[k] - c[k];
                    d += diff * diff;
                }
                if (d < dist[i]) dist[i] = d;
                if (dist[i] > best) {  // first argmax, like jnp.argmax
                    best = dist[i];
                    best_i = i;
                }
            }
            farthest = best_i;
        }
        delete[] dist;
    }
}

}  // extern "C"
