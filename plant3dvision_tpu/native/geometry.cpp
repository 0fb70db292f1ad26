// Native geometry module for plant3dvision_tpu.
//
// Role of the reference's romicgal (C++/CGAL bindings used for Poisson
// meshing + skeletonization, reference proc3d.py:82,156): here the surface
// extraction runs on the signed-distance volume via marching tetrahedra
// (table-free, watertight by construction), with global vertex dedup.
//
// C API (ctypes-friendly):
//   int p3d_marching_tetrahedra(const float* vol, int nx, int ny, int nz,
//                               float level,
//                               float** out_verts, long long* n_verts,
//                               int** out_tris, long long* n_tris);
//   void p3d_free(void* ptr);
//
// Triangles are oriented so the right-hand normal points toward
// vol > level (outside, for a signed distance that is positive inside —
// callers flip as needed).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
    float x, y, z;
};

// The 6-tetrahedra decomposition of a cube around the main diagonal 0-7
// (every tet contains edge 0-7). This decomposition is CONFORMING: the
// diagonal induced on each cube face matches the neighboring cube's, which
// makes the extracted surface watertight. Corners indexed 0..7 as
// (dx, dy, dz) bits: corner = dx + 2*dy + 4*dz.
static const int kTets[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
};

static const int kCorner[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
};

struct MeshBuilder {
    std::vector<float> verts;
    std::vector<int32_t> tris;
    // edge key = packed pair of global lattice ids
    std::unordered_map<uint64_t, int32_t> edge_vertex;

    int nx, ny, nz;
    const float* vol;
    float level;

    inline float val(int64_t gid) const { return vol[gid]; }

    inline int64_t gid(int x, int y, int z) const {
        return (int64_t)(x) * ny * nz + (int64_t)(y) * nz + z;
    }

    inline V3 pos(int64_t g) const {
        int z = (int)(g % nz);
        int y = (int)((g / nz) % ny);
        int x = (int)(g / ((int64_t)ny * nz));
        return V3{(float)x, (float)y, (float)z};
    }

    // Interpolated vertex on edge (a, b); memoized globally.
    int32_t edge_point(int64_t a, int64_t b) {
        if (a > b) std::swap(a, b);
        // unique pack: lattice ids are < 2^31 for any grid we handle
        uint64_t key = ((uint64_t)a << 32) | (uint64_t)b;
        auto it = edge_vertex.find(key);
        if (it != edge_vertex.end()) return it->second;
        float va = val(a), vb = val(b);
        float t = (level - va) / (vb - va);
        if (t < 0.f) t = 0.f;
        if (t > 1.f) t = 1.f;
        V3 pa = pos(a), pb = pos(b);
        verts.push_back(pa.x + t * (pb.x - pa.x));
        verts.push_back(pa.y + t * (pb.y - pa.y));
        verts.push_back(pa.z + t * (pb.z - pa.z));
        int32_t idx = (int32_t)(verts.size() / 3 - 1);
        edge_vertex.emplace(key, idx);
        return idx;
    }

    void emit(int32_t a, int32_t b, int32_t c) {
        if (a == b || b == c || a == c) return;  // degenerate
        tris.push_back(a);
        tris.push_back(b);
        tris.push_back(c);
    }

    // Marching tetrahedron: corners p[4] (global ids). Inside = val > level.
    void do_tet(const int64_t p[4]) {
        bool in[4];
        int n_in = 0;
        for (int i = 0; i < 4; i++) {
            in[i] = val(p[i]) > level;
            n_in += in[i];
        }
        if (n_in == 0 || n_in == 4) return;

        int ins[4], outs[4];
        int ni = 0, no = 0;
        for (int i = 0; i < 4; i++) {
            if (in[i]) ins[ni++] = i;
            else outs[no++] = i;
        }
        // orientation: use the tet's signed volume to keep normals consistent
        if (n_in == 1) {
            int i0 = ins[0];
            int32_t e0 = edge_point(p[i0], p[outs[0]]);
            int32_t e1 = edge_point(p[i0], p[outs[1]]);
            int32_t e2 = edge_point(p[i0], p[outs[2]]);
            // order outs so the triangle normal points away from the inside
            if (orient(p[i0], p[outs[0]], p[outs[1]], p[outs[2]]) > 0)
                emit(e0, e1, e2);
            else
                emit(e0, e2, e1);
        } else if (n_in == 3) {
            int o0 = outs[0];
            int32_t e0 = edge_point(p[o0], p[ins[0]]);
            int32_t e1 = edge_point(p[o0], p[ins[1]]);
            int32_t e2 = edge_point(p[o0], p[ins[2]]);
            if (orient(p[o0], p[ins[0]], p[ins[1]], p[ins[2]]) > 0)
                emit(e0, e2, e1);
            else
                emit(e0, e1, e2);
        } else {  // 2-2: quad -> two triangles
            int i0 = ins[0], i1 = ins[1], o0 = outs[0], o1 = outs[1];
            int32_t a = edge_point(p[i0], p[o0]);
            int32_t b = edge_point(p[i0], p[o1]);
            int32_t c = edge_point(p[i1], p[o1]);
            int32_t d = edge_point(p[i1], p[o0]);
            if (orient(p[i0], p[i1], p[o0], p[o1]) > 0) {
                emit(a, b, c);
                emit(a, c, d);
            } else {
                emit(a, c, b);
                emit(a, d, c);
            }
        }
    }

    // signed orientation of tet (a, b, c, d) in lattice coords
    float orient(int64_t a, int64_t b, int64_t c, int64_t d) {
        V3 pa = pos(a), pb = pos(b), pc = pos(c), pd = pos(d);
        float ux = pb.x - pa.x, uy = pb.y - pa.y, uz = pb.z - pa.z;
        float vx = pc.x - pa.x, vy = pc.y - pa.y, vz = pc.z - pa.z;
        float wx = pd.x - pa.x, wy = pd.y - pa.y, wz = pd.z - pa.z;
        return ux * (vy * wz - vz * wy) - uy * (vx * wz - vz * wx) +
               uz * (vx * wy - vy * wx);
    }

    void run() {
        for (int x = 0; x + 1 < nx; x++) {
            for (int y = 0; y + 1 < ny; y++) {
                // quick reject: scan the z-column pairwise
                for (int z = 0; z + 1 < nz; z++) {
                    // cube corner values; skip if all same side
                    bool any_in = false, any_out = false;
                    int64_t g[8];
                    for (int c = 0; c < 8; c++) {
                        g[c] = gid(x + kCorner[c][0], y + kCorner[c][1],
                                   z + kCorner[c][2]);
                        if (val(g[c]) > level) any_in = true;
                        else any_out = true;
                    }
                    if (!any_in || !any_out) continue;
                    for (int t = 0; t < 6; t++) {
                        int64_t p[4] = {g[kTets[t][0]], g[kTets[t][1]],
                                        g[kTets[t][2]], g[kTets[t][3]]};
                        do_tet(p);
                    }
                }
            }
        }
    }
};

}  // namespace

extern "C" {

int p3d_marching_tetrahedra(const float* vol, int nx, int ny, int nz,
                            float level, float** out_verts,
                            long long* n_verts, int** out_tris,
                            long long* n_tris) {
    MeshBuilder mb;
    mb.nx = nx;
    mb.ny = ny;
    mb.nz = nz;
    mb.vol = vol;
    mb.level = level;
    mb.run();

    *n_verts = (long long)(mb.verts.size() / 3);
    *n_tris = (long long)(mb.tris.size() / 3);
    *out_verts = (float*)std::malloc(mb.verts.size() * sizeof(float));
    *out_tris = (int*)std::malloc(mb.tris.size() * sizeof(int));
    if (!*out_verts || !*out_tris) return -1;
    std::memcpy(*out_verts, mb.verts.data(), mb.verts.size() * sizeof(float));
    std::memcpy(*out_tris, mb.tris.data(), mb.tris.size() * sizeof(int));
    return 0;
}

void p3d_free(void* ptr) { std::free(ptr); }

}  // extern "C"
