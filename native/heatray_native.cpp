// heatray_tpu native host-side accelerators.
//
// The TPU compute path is JAX/Pallas; this library accelerates the HOST side
// of scene ingestion, the role the reference delegates to native code
// (Assimp + AssimpMeshProvider.cpp): OBJ tokenizing/triangulation, Morton
// ordering of triangle centroids (scene/geometry.py's accel ordering), and
// area-weighted vertex normal generation.  Exposed as a plain C ABI for
// ctypes; Python falls back to numpy when the library is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC heatray_native.cpp -o libheatray_native.so

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Morton ordering of triangle centroids (30-bit, 10 per axis).
// positions: (V, 3) f32; indices: (T, 3) i32; out_order: (T,) i64.
// ---------------------------------------------------------------------------
static inline uint64_t spread10(uint64_t x) {
    x = (x | (x << 16)) & 0x030000FFULL;
    x = (x | (x << 8)) & 0x0300F00FULL;
    x = (x | (x << 4)) & 0x030C30C3ULL;
    x = (x | (x << 2)) & 0x09249249ULL;
    return x;
}

void morton_order(const float* positions, int64_t num_vertices,
                  const int32_t* indices, int64_t num_triangles,
                  int64_t* out_order) {
    (void)num_vertices;
    std::vector<float> cx(num_triangles), cy(num_triangles), cz(num_triangles);
    float lo[3] = {1e30f, 1e30f, 1e30f};
    float hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t t = 0; t < num_triangles; ++t) {
        float c[3] = {0.f, 0.f, 0.f};
        for (int k = 0; k < 3; ++k) {
            const float* v = positions + 3 * (int64_t)indices[3 * t + k];
            c[0] += v[0]; c[1] += v[1]; c[2] += v[2];
        }
        cx[t] = c[0] / 3.f; cy[t] = c[1] / 3.f; cz[t] = c[2] / 3.f;
        lo[0] = std::min(lo[0], cx[t]); hi[0] = std::max(hi[0], cx[t]);
        lo[1] = std::min(lo[1], cy[t]); hi[1] = std::max(hi[1], cy[t]);
        lo[2] = std::min(lo[2], cz[t]); hi[2] = std::max(hi[2], cz[t]);
    }
    float ext[3];
    for (int a = 0; a < 3; ++a) ext[a] = std::max(hi[a] - lo[a], 1e-12f);
    std::vector<uint64_t> code(num_triangles);
    for (int64_t t = 0; t < num_triangles; ++t) {
        auto q = [&](float c, int a) -> uint64_t {
            float f = (c - lo[a]) / ext[a] * 1023.0f;
            f = std::min(std::max(f, 0.0f), 1023.0f);
            return (uint64_t)f;
        };
        code[t] = (spread10(q(cx[t], 0)) << 2) | (spread10(q(cy[t], 1)) << 1) |
                  spread10(q(cz[t], 2));
    }
    std::iota(out_order, out_order + num_triangles, (int64_t)0);
    std::stable_sort(out_order, out_order + num_triangles,
                     [&](int64_t a, int64_t b) { return code[a] < code[b]; });
}

// ---------------------------------------------------------------------------
// Area-weighted smooth vertex normals.
// positions: (V, 3) f32; indices: (T, 3) i32; out_normals: (V, 3) f32.
// ---------------------------------------------------------------------------
void vertex_normals(const float* positions, int64_t num_vertices,
                    const int32_t* indices, int64_t num_triangles,
                    float* out_normals) {
    std::memset(out_normals, 0, sizeof(float) * 3 * num_vertices);
    for (int64_t t = 0; t < num_triangles; ++t) {
        const int32_t i0 = indices[3 * t], i1 = indices[3 * t + 1],
                      i2 = indices[3 * t + 2];
        const float* a = positions + 3 * (int64_t)i0;
        const float* b = positions + 3 * (int64_t)i1;
        const float* c = positions + 3 * (int64_t)i2;
        float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
        float e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
        float n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                      e1[2] * e2[0] - e1[0] * e2[2],
                      e1[0] * e2[1] - e1[1] * e2[0]};
        for (int32_t idx : {i0, i1, i2}) {
            out_normals[3 * (int64_t)idx + 0] += n[0];
            out_normals[3 * (int64_t)idx + 1] += n[1];
            out_normals[3 * (int64_t)idx + 2] += n[2];
        }
    }
    for (int64_t v = 0; v < num_vertices; ++v) {
        float* n = out_normals + 3 * v;
        float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        float inv = len > 1e-20f ? 1.0f / len : 0.0f;
        n[0] *= inv; n[1] *= inv; n[2] *= inv;
    }
}

// ---------------------------------------------------------------------------
// OBJ parsing: tokenizes v/vt/vn/f lines, fan-triangulates polygons, and
// resolves per-corner v/vt/vn index triplets into flat corner streams
// (the same dereference AssimpMeshProvider performs).  Two-phase API:
//   obj_parse() -> handle with counts; obj_read() copies out; obj_free().
// ---------------------------------------------------------------------------
struct ObjData {
    std::vector<float> v, vt, vn;     // raw streams (3/2/3 per entry)
    std::vector<int32_t> fv, ft, fn;  // per corner (3 per triangle); -1 = none
};

static const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

void* obj_parse(const char* text, int64_t length, int64_t* out_counts) {
    ObjData* d = new ObjData();
    const char* p = text;
    const char* end = text + length;
    std::vector<int32_t> face_v, face_t, face_n;
    while (p < end) {
        const char* line_end = (const char*)memchr(p, '\n', (size_t)(end - p));
        if (!line_end) line_end = end;
        const char* q = skip_ws(p, line_end);
        if (q + 1 < line_end && q[0] == 'v' &&
            (q[1] == ' ' || q[1] == '\t')) {
            char* r = nullptr;
            double a = strtod(q + 1, &r), b = strtod(r, &r), c = strtod(r, &r);
            d->v.push_back((float)a); d->v.push_back((float)b); d->v.push_back((float)c);
        } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 't') {
            char* r = nullptr;
            double a = strtod(q + 2, &r), b = strtod(r, &r);
            d->vt.push_back((float)a); d->vt.push_back((float)b);
        } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 'n') {
            char* r = nullptr;
            double a = strtod(q + 2, &r), b = strtod(r, &r), c = strtod(r, &r);
            d->vn.push_back((float)a); d->vn.push_back((float)b); d->vn.push_back((float)c);
        } else if (q < line_end && q[0] == 'f' &&
                   (q + 1 == line_end || q[1] == ' ' || q[1] == '\t')) {
            face_v.clear(); face_t.clear(); face_n.clear();
            const char* r = q + 1;
            int64_t nv = (int64_t)d->v.size() / 3;
            int64_t nt = (int64_t)d->vt.size() / 2;
            int64_t nn = (int64_t)d->vn.size() / 3;
            while (r < line_end) {
                r = skip_ws(r, line_end);
                if (r >= line_end) break;
                char* s = nullptr;
                long vi = strtol(r, &s, 10);
                if (s == r) break;
                long ti = 0, ni = 0; bool has_t = false, has_n = false;
                if (s < line_end && *s == '/') {
                    ++s;
                    if (s < line_end && *s != '/') { ti = strtol(s, &s, 10); has_t = true; }
                    if (s < line_end && *s == '/') { ++s; ni = strtol(s, &s, 10); has_n = true; }
                }
                auto fix = [](long i, int64_t n) -> int32_t {
                    if (i > 0) return (int32_t)(i - 1);
                    if (i < 0) return (int32_t)(n + i);
                    return -1;
                };
                face_v.push_back(fix(vi, nv));
                face_t.push_back(has_t ? fix(ti, nt) : -1);
                face_n.push_back(has_n ? fix(ni, nn) : -1);
                r = s;
            }
            for (size_t k = 2; k < face_v.size(); ++k) {  // fan triangulation
                int idxs[3] = {0, (int)k - 1, (int)k};
                for (int j : idxs) {
                    d->fv.push_back(face_v[(size_t)j]);
                    d->ft.push_back(face_t[(size_t)j]);
                    d->fn.push_back(face_n[(size_t)j]);
                }
            }
        }
        p = line_end + 1;
    }
    out_counts[0] = (int64_t)d->v.size() / 3;
    out_counts[1] = (int64_t)d->vt.size() / 2;
    out_counts[2] = (int64_t)d->vn.size() / 3;
    out_counts[3] = (int64_t)d->fv.size() / 3;  // triangles
    return d;
}

void obj_read(void* handle, float* v, float* vt, float* vn,
              int32_t* fv, int32_t* ft, int32_t* fn) {
    ObjData* d = (ObjData*)handle;
    std::memcpy(v, d->v.data(), d->v.size() * sizeof(float));
    std::memcpy(vt, d->vt.data(), d->vt.size() * sizeof(float));
    std::memcpy(vn, d->vn.data(), d->vn.size() * sizeof(float));
    std::memcpy(fv, d->fv.data(), d->fv.size() * sizeof(int32_t));
    std::memcpy(ft, d->ft.data(), d->ft.size() * sizeof(int32_t));
    std::memcpy(fn, d->fn.data(), d->fn.size() * sizeof(int32_t));
}

void obj_free(void* handle) { delete (ObjData*)handle; }

}  // extern "C"
