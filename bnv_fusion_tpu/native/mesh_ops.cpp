// Native mesh runtime: batched marching tetrahedra + vertex welding.
//
// The reference's host-side meshing leans on external C libraries (skimage
// marching_cubes per 500-voxel batch, Open3D vertex merging — reference
// src/models/sparse_volume.py:697-766, src/utils/o3d_helper.py:220-241).
// This framework's equivalent native component extracts the iso-surface from
// sparse unit cells in one pass: the same 6-tetrahedra decomposition and
// case tables as the numpy implementation in bnv_fusion_tpu/mesh.py (which
// remains the portable fallback), at C++ speed with a fused weld step.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: cc -O3 -march=native -shared -fPIC mesh_ops.cpp -o libmesh_ops.so

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// cube corners in (4*dx + 2*dy + dz) order
const int kCorner[8][3] = {{0, 0, 0}, {0, 0, 1}, {0, 1, 0}, {0, 1, 1},
                           {1, 0, 0}, {1, 0, 1}, {1, 1, 0}, {1, 1, 1}};
// six tetrahedra around the main diagonal c0-c7
const int kTets[6][4] = {{0, 4, 5, 7}, {0, 5, 1, 7}, {0, 1, 3, 7},
                         {0, 3, 2, 7}, {0, 2, 6, 7}, {0, 6, 4, 7}};
const int kTetEdges[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};

// 16-case table filled at init from the same orientation rule as mesh.py
int g_tet_table[16][2][3];
bool g_table_ready = false;

void cross3(const double a[3], const double b[3], double out[3]) {
  out[0] = a[1] * b[2] - a[2] * b[1];
  out[1] = a[2] * b[0] - a[0] * b[2];
  out[2] = a[0] * b[1] - a[1] * b[0];
}

void build_table() {
  const double verts[4][3] = {{0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int mask = 0; mask < 16; ++mask)
    for (int t = 0; t < 2; ++t)
      for (int e = 0; e < 3; ++e) g_tet_table[mask][t][e] = -1;

  for (int mask = 1; mask < 15; ++mask) {
    int inside[4], outside[4], n_in = 0, n_out = 0;
    for (int v = 0; v < 4; ++v) {
      if (mask & (1 << v))
        inside[n_in++] = v;
      else
        outside[n_out++] = v;
    }
    int cut[6], n_cut = 0;
    double pts[6][3];
    for (int e = 0; e < 6; ++e) {
      const bool a_in = (mask >> kTetEdges[e][0]) & 1;
      const bool b_in = (mask >> kTetEdges[e][1]) & 1;
      if (a_in != b_in) {
        cut[n_cut] = e;
        for (int d = 0; d < 3; ++d)
          pts[e][d] = 0.5 * (verts[kTetEdges[e][0]][d] +
                             verts[kTetEdges[e][1]][d]);
        ++n_cut;
      }
    }
    double in_c[3] = {0, 0, 0}, out_c[3] = {0, 0, 0}, out_dir[3];
    for (int i = 0; i < n_in; ++i)
      for (int d = 0; d < 3; ++d) in_c[d] += verts[inside[i]][d] / n_in;
    for (int i = 0; i < n_out; ++i)
      for (int d = 0; d < 3; ++d) out_c[d] += verts[outside[i]][d] / n_out;
    for (int d = 0; d < 3; ++d) out_dir[d] = out_c[d] - in_c[d];

    auto orient = [&](int tri[3]) {
      double ab[3], ac[3], n[3];
      for (int d = 0; d < 3; ++d) {
        ab[d] = pts[tri[1]][d] - pts[tri[0]][d];
        ac[d] = pts[tri[2]][d] - pts[tri[0]][d];
      }
      cross3(ab, ac, n);
      const double dot =
          n[0] * out_dir[0] + n[1] * out_dir[1] + n[2] * out_dir[2];
      // the 6 cube tets are left-handed vs this canonical tet: invert
      if (dot >= 0) {
        const int tmp = tri[1];
        tri[1] = tri[2];
        tri[2] = tmp;
      }
    };

    if (n_in == 1 || n_in == 3) {
      int tri[3] = {cut[0], cut[1], cut[2]};
      orient(tri);
      for (int e = 0; e < 3; ++e) g_tet_table[mask][0][e] = tri[e];
    } else {  // 2-2: quad over edges (i0,o0),(i0,o1),(i1,o1),(i1,o0)
      auto edge_id = [&](int a, int b) {
        if (a > b) {
          const int t = a;
          a = b;
          b = t;
        }
        for (int e = 0; e < 6; ++e)
          if (kTetEdges[e][0] == a && kTetEdges[e][1] == b) return e;
        return -1;
      };
      const int quad[4] = {edge_id(inside[0], outside[0]),
                           edge_id(inside[0], outside[1]),
                           edge_id(inside[1], outside[1]),
                           edge_id(inside[1], outside[0])};
      int t1[3] = {quad[0], quad[1], quad[2]};
      int t2[3] = {quad[0], quad[2], quad[3]};
      orient(t1);
      orient(t2);
      for (int e = 0; e < 3; ++e) {
        g_tet_table[mask][0][e] = t1[e];
        g_tet_table[mask][1][e] = t2[e];
      }
    }
  }
  g_table_ready = true;
}

struct Key {
  int64_t a, b, c;
  bool operator==(const Key& o) const {
    return a == o.a && b == o.b && c == o.c;
  }
};
struct KeyHash {
  size_t operator()(const Key& k) const {
    size_t h = static_cast<size_t>(k.a) * 0x9E3779B97F4A7C15ull;
    h ^= static_cast<size_t>(k.b) * 0xC2B2AE3D27D4EB4Full + (h << 6);
    h ^= static_cast<size_t>(k.c) * 0x165667B19E3779F9ull + (h << 6);
    return h;
  }
};

struct MeshOut {
  std::vector<float> verts;
  std::vector<int32_t> faces;
};

MeshOut* g_last = nullptr;

}  // namespace

extern "C" {

// Extract the iso-surface from M sparse cells.
//   origins: [M,3] int64 lattice cell origins
//   sdf:     [M,8] float corner SDF in (4dx+2dy+dz) order
//   weld_tol: vertex weld tolerance in lattice units (<=0 disables welding)
// Returns number of triangles; call mesh_ops_get to copy the buffers out.
int64_t mesh_ops_marching_tets(const int64_t* origins, const float* sdf,
                               int64_t m, double weld_tol) {
  if (!g_table_ready) build_table();
  delete g_last;
  g_last = new MeshOut();
  std::unordered_map<Key, int32_t, KeyHash> weld;
  const double inv_tol = weld_tol > 0 ? 1.0 / weld_tol : 0.0;

  auto emit_vertex = [&](const double p[3]) -> int32_t {
    if (weld_tol > 0) {
      const Key k{static_cast<int64_t>(p[0] * inv_tol + (p[0] >= 0 ? .5 : -.5)),
                  static_cast<int64_t>(p[1] * inv_tol + (p[1] >= 0 ? .5 : -.5)),
                  static_cast<int64_t>(p[2] * inv_tol + (p[2] >= 0 ? .5 : -.5))};
      auto it = weld.find(k);
      if (it != weld.end()) return it->second;
      const int32_t id = static_cast<int32_t>(g_last->verts.size() / 3);
      weld.emplace(k, id);
      g_last->verts.push_back(static_cast<float>(p[0]));
      g_last->verts.push_back(static_cast<float>(p[1]));
      g_last->verts.push_back(static_cast<float>(p[2]));
      return id;
    }
    const int32_t id = static_cast<int32_t>(g_last->verts.size() / 3);
    g_last->verts.push_back(static_cast<float>(p[0]));
    g_last->verts.push_back(static_cast<float>(p[1]));
    g_last->verts.push_back(static_cast<float>(p[2]));
    return id;
  };

  for (int64_t ci = 0; ci < m; ++ci) {
    const float* s = sdf + ci * 8;
    float mn = s[0], mx = s[0];
    for (int k = 1; k < 8; ++k) {
      if (s[k] < mn) mn = s[k];
      if (s[k] > mx) mx = s[k];
    }
    if (mn >= 0 || mx <= 0) continue;
    const int64_t* o = origins + ci * 3;
    for (int t = 0; t < 6; ++t) {
      float ts[4];
      double tv[4][3];
      int mask = 0;
      for (int v = 0; v < 4; ++v) {
        const int c = kTets[t][v];
        ts[v] = s[c];
        if (ts[v] < 0) mask |= 1 << v;
        for (int d = 0; d < 3; ++d) tv[v][d] = double(o[d]) + kCorner[c][d];
      }
      if (mask == 0 || mask == 15) continue;
      double epts[6][3];
      for (int e = 0; e < 6; ++e) {
        const int a = kTetEdges[e][0], b = kTetEdges[e][1];
        const double denom = double(ts[b]) - double(ts[a]);
        double frac = denom != 0 ? -double(ts[a]) / denom : 0.5;
        if (frac < 0) frac = 0;
        if (frac > 1) frac = 1;
        for (int d = 0; d < 3; ++d)
          epts[e][d] = tv[a][d] + frac * (tv[b][d] - tv[a][d]);
      }
      for (int tri = 0; tri < 2; ++tri) {
        const int* te = g_tet_table[mask][tri];
        if (te[0] < 0) continue;
        const int32_t i0 = emit_vertex(epts[te[0]]);
        const int32_t i1 = emit_vertex(epts[te[1]]);
        const int32_t i2 = emit_vertex(epts[te[2]]);
        if (i0 == i1 || i1 == i2 || i0 == i2) continue;  // welded degenerate
        g_last->faces.push_back(i0);
        g_last->faces.push_back(i1);
        g_last->faces.push_back(i2);
      }
    }
  }
  return static_cast<int64_t>(g_last->faces.size() / 3);
}

int64_t mesh_ops_num_vertices() {
  return g_last ? static_cast<int64_t>(g_last->verts.size() / 3) : 0;
}

void mesh_ops_get(float* verts_out, int32_t* faces_out) {
  if (!g_last) return;
  std::memcpy(verts_out, g_last->verts.data(),
              g_last->verts.size() * sizeof(float));
  std::memcpy(faces_out, g_last->faces.data(),
              g_last->faces.size() * sizeof(int32_t));
}

void mesh_ops_free() {
  delete g_last;
  g_last = nullptr;
}

}  // extern "C"
