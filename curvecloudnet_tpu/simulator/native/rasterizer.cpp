// Z-buffer triangle rasterizer (CPU, C++) for the offline scanning simulator.
//
// Native replacement for the reference's CUDA `minimal_pytorch_rasterizer`
// (reference scanning_simulator/utils/minimal_rasterizer.py:14-51): pinhole
// projection of a triangle mesh to per-pixel 3D coordinates + face normals +
// coverage mask.  Runs once per dataset build, so a scalar CPU kernel with
// OpenMP-free deterministic loops is the right tool; exposed via ctypes.
//
// Build: g++ -O3 -shared -fPIC -o librasterizer.so rasterizer.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

extern "C" {

// vertices: (n_verts, 3) camera-space float32
// faces:    (n_faces, 3) int32
// fx, fy, cx, cy: pinhole intrinsics;  h, w: image size
// out_coords:  (h, w, 3) float32 — camera-space surface point per pixel
// out_normals: (h, w, 3) float32 — face normal per pixel
// out_depth:   (h, w)    float32 — z-buffer (inf where empty)
// out_mask:    (h, w)    uint8   — 1 where covered
void rasterize_mesh(const float* vertices, int64_t n_verts,
                    const int32_t* faces, int64_t n_faces,
                    float fx, float fy, float cx, float cy,
                    int32_t h, int32_t w,
                    float* out_coords, float* out_normals,
                    float* out_depth, uint8_t* out_mask) {
    const float INF = std::numeric_limits<float>::infinity();
    for (int64_t i = 0; i < (int64_t)h * w; ++i) {
        out_depth[i] = INF;
        out_mask[i] = 0;
    }
    std::memset(out_coords, 0, sizeof(float) * h * w * 3);
    std::memset(out_normals, 0, sizeof(float) * h * w * 3);

    for (int64_t f = 0; f < n_faces; ++f) {
        const int32_t ia = faces[f * 3 + 0], ib = faces[f * 3 + 1],
                      ic = faces[f * 3 + 2];
        if (ia >= n_verts || ib >= n_verts || ic >= n_verts) continue;
        const float* A = vertices + (int64_t)ia * 3;
        const float* B = vertices + (int64_t)ib * 3;
        const float* C = vertices + (int64_t)ic * 3;
        if (A[2] <= 1e-6f || B[2] <= 1e-6f || C[2] <= 1e-6f) continue;

        // face normal (camera space)
        float e1[3] = {B[0] - A[0], B[1] - A[1], B[2] - A[2]};
        float e2[3] = {C[0] - A[0], C[1] - A[1], C[2] - A[2]};
        float nrm[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                        e1[2] * e2[0] - e1[0] * e2[2],
                        e1[0] * e2[1] - e1[1] * e2[0]};
        float nl = std::sqrt(nrm[0] * nrm[0] + nrm[1] * nrm[1] +
                             nrm[2] * nrm[2]);
        if (nl < 1e-12f) continue;
        nrm[0] /= nl; nrm[1] /= nl; nrm[2] /= nl;
        // orient towards camera (viewing dir +z)
        if (nrm[2] > 0) { nrm[0] = -nrm[0]; nrm[1] = -nrm[1]; nrm[2] = -nrm[2]; }

        // project
        float ax = fx * A[0] / A[2] + cx, ay = fy * A[1] / A[2] + cy;
        float bx = fx * B[0] / B[2] + cx, by = fy * B[1] / B[2] + cy;
        float cxp = fx * C[0] / C[2] + cx, cyp = fy * C[1] / C[2] + cy;

        int x0 = (int)std::floor(std::fmin(ax, std::fmin(bx, cxp)));
        int x1 = (int)std::ceil(std::fmax(ax, std::fmax(bx, cxp)));
        int y0 = (int)std::floor(std::fmin(ay, std::fmin(by, cyp)));
        int y1 = (int)std::ceil(std::fmax(ay, std::fmax(by, cyp)));
        if (x0 < 0) x0 = 0;
        if (y0 < 0) y0 = 0;
        if (x1 >= w) x1 = w - 1;
        if (y1 >= h) y1 = h - 1;
        if (x0 > x1 || y0 > y1) continue;

        const float det = (by - cyp) * (ax - cxp) + (cxp - bx) * (ay - cyp);
        if (std::fabs(det) < 1e-12f) continue;
        const float inv_det = 1.0f / det;
        const float iza = 1.0f / A[2], izb = 1.0f / B[2], izc = 1.0f / C[2];

        for (int y = y0; y <= y1; ++y) {
            for (int x = x0; x <= x1; ++x) {
                const float px = (float)x + 0.5f, py = (float)y + 0.5f;
                float l0 = ((by - cyp) * (px - cxp) + (cxp - bx) * (py - cyp))
                           * inv_det;
                float l1 = ((cyp - ay) * (px - cxp) + (ax - cxp) * (py - cyp))
                           * inv_det;
                float l2 = 1.0f - l0 - l1;
                if (l0 < -1e-6f || l1 < -1e-6f || l2 < -1e-6f) continue;
                // perspective-correct interpolation via 1/z
                float iz = l0 * iza + l1 * izb + l2 * izc;
                float z = 1.0f / iz;
                int64_t pix = (int64_t)y * w + x;
                if (z < out_depth[pix]) {
                    out_depth[pix] = z;
                    float w0 = l0 * iza * z, w1 = l1 * izb * z,
                          w2 = l2 * izc * z;
                    for (int d = 0; d < 3; ++d) {
                        out_coords[pix * 3 + d] =
                            w0 * A[d] + w1 * B[d] + w2 * C[d];
                        out_normals[pix * 3 + d] = nrm[d];
                    }
                    out_mask[pix] = 1;
                }
            }
        }
    }
}

}  // extern "C"
