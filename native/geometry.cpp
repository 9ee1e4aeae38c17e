// Native geometry kernels: meshlet clustering + quadric-error-metric simplification.
//
// The TPU engine's counterpart to the reference's meshoptimizer dependency
// (meshopt_buildMeshlets / meshopt_simplifyWithAttributes used by the GLTF bake at
// /root/reference/Oxylus/src/Asset/AssetManager_GLTF.cpp:746-883) — implemented from
// scratch: morton-ordered greedy meshlet packing under vertex/triangle budgets, and
// iterative edge-collapse simplification driven by vertex quadrics with boundary
// protection. Exposed as a C ABI consumed from Python via ctypes (assets/native.py).
//
// Build: g++ -O3 -shared -fPIC geometry.cpp -o liboxgeom.so

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <queue>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

inline uint64_t spread3(uint64_t v) {
  v = (v | (v << 16)) & 0x030000FFULL;
  v = (v | (v << 8)) & 0x0300F00FULL;
  v = (v | (v << 4)) & 0x030C30C3ULL;
  v = (v | (v << 2)) & 0x09249249ULL;
  return v;
}

struct Quadric {
  // symmetric 4x4 error quadric: a2 ab ac ad | b2 bc bd | c2 cd | d2
  double m[10] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0};
  void add_plane(double a, double b, double c, double d, double w) {
    m[0] += a * a * w; m[1] += a * b * w; m[2] += a * c * w; m[3] += a * d * w;
    m[4] += b * b * w; m[5] += b * c * w; m[6] += b * d * w;
    m[7] += c * c * w; m[8] += c * d * w; m[9] += d * d * w;
  }
  void add(const Quadric& o) {
    for (int i = 0; i < 10; i++) m[i] += o.m[i];
  }
  double eval(const float* p) const {
    double x = p[0], y = p[1], z = p[2];
    return m[0] * x * x + 2 * m[1] * x * y + 2 * m[2] * x * z + 2 * m[3] * x +
           m[4] * y * y + 2 * m[5] * y * z + 2 * m[6] * y + m[7] * z * z +
           2 * m[8] * z + m[9];
  }
};

struct Collapse {
  double cost;
  uint32_t a, b;      // collapse a -> b (b survives)
  uint64_t stamp;     // lazy invalidation: max(version[a], version[b]) at push time
  bool operator<(const Collapse& o) const { return cost > o.cost; }  // min-heap
};

}  // namespace

extern "C" {

// Returns the number of meshlets written. Output buffers must be sized for the worst
// case: index_count/3 meshlets, indirect_vertices up to index_count entries,
// local_triangles index_count bytes.
int ox_build_meshlets(const float* positions, int vertex_count, const uint32_t* indices,
                      int index_count, int max_verts, int max_tris,
                      uint32_t* ml_vertex_offset, uint32_t* ml_vertex_count,
                      uint32_t* ml_tri_offset, uint32_t* ml_tri_count,
                      uint32_t* indirect_vertices, uint8_t* local_triangles) {
  (void)vertex_count;
  const int tri_count = index_count / 3;
  if (tri_count == 0) return 0;

  float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
  std::vector<std::array<float, 3>> cent(tri_count);
  for (int t = 0; t < tri_count; t++) {
    float c[3] = {0, 0, 0};
    for (int k = 0; k < 3; k++) {
      const float* p = positions + 3 * indices[3 * t + k];
      c[0] += p[0]; c[1] += p[1]; c[2] += p[2];
    }
    for (int a = 0; a < 3; a++) {
      cent[t][a] = c[a] / 3.0f;
      mn[a] = std::min(mn[a], cent[t][a]);
      mx[a] = std::max(mx[a], cent[t][a]);
    }
  }
  std::vector<std::pair<uint64_t, int>> order(tri_count);
  for (int t = 0; t < tri_count; t++) {
    uint64_t code = 0;
    for (int a = 0; a < 3; a++) {
      float range = mx[a] - mn[a];
      float s = range > 1e-12f ? (cent[t][a] - mn[a]) / range : 0.0f;
      uint64_t qv = (uint64_t)std::min(1023.0f, std::max(0.0f, s * 1023.0f));
      code |= spread3(qv) << a;
    }
    order[t] = {code, t};
  }
  std::sort(order.begin(), order.end());

  int n_meshlets = 0;
  uint32_t iv_cursor = 0, lt_cursor = 0;
  std::unordered_map<uint32_t, uint8_t> slot;
  slot.reserve(max_verts * 2);
  std::vector<uint32_t> verts;
  verts.reserve(max_verts);
  std::vector<uint8_t> tris;
  tris.reserve(max_tris * 3);

  auto flush = [&]() {
    if (tris.empty()) return;
    ml_vertex_offset[n_meshlets] = iv_cursor;
    ml_vertex_count[n_meshlets] = (uint32_t)verts.size();
    ml_tri_offset[n_meshlets] = lt_cursor / 3;
    ml_tri_count[n_meshlets] = (uint32_t)(tris.size() / 3);
    std::memcpy(indirect_vertices + iv_cursor, verts.data(), verts.size() * 4);
    std::memcpy(local_triangles + lt_cursor, tris.data(), tris.size());
    iv_cursor += (uint32_t)verts.size();
    lt_cursor += (uint32_t)tris.size();
    n_meshlets++;
    slot.clear();
    verts.clear();
    tris.clear();
  };

  for (auto& ot : order) {
    const uint32_t* tv = indices + 3 * ot.second;
    int fresh = 0;
    for (int k = 0; k < 3; k++) fresh += slot.find(tv[k]) == slot.end() ? 1 : 0;
    if ((int)verts.size() + fresh > max_verts || (int)tris.size() / 3 + 1 > max_tris) flush();
    for (int k = 0; k < 3; k++) {
      auto it = slot.find(tv[k]);
      uint8_t s;
      if (it == slot.end()) {
        s = (uint8_t)verts.size();
        slot.emplace(tv[k], s);
        verts.push_back(tv[k]);
      } else {
        s = it->second;
      }
      tris.push_back(s);
    }
  }
  flush();
  return n_meshlets;
}

// QEM edge-collapse simplification toward target_index_count; collapses whose quadric
// error exceeds max_error (squared-distance units) are refused. Endpoint ("subset")
// placement keeps surviving vertices on the original mesh, so the caller's vertex
// buffer stays valid. Boundary edges receive a strong penalty plane. Returns the new
// index count written to out_indices; *out_error reports the max collapse error taken.
int ox_simplify(const float* positions, int vertex_count, const uint32_t* indices,
                int index_count, int target_index_count, float max_error,
                uint32_t* out_indices, float* out_error) {
  const int tri_count = index_count / 3;
  *out_error = 0.0f;
  if (tri_count == 0) return 0;

  std::vector<Quadric> q(vertex_count);
  // edge -> face count for boundary detection
  std::unordered_map<uint64_t, int> edge_faces;
  edge_faces.reserve(index_count);
  auto ekey = [](uint32_t a, uint32_t b) {
    return ((uint64_t)std::min(a, b) << 32) | std::max(a, b);
  };

  for (int t = 0; t < tri_count; t++) {
    const uint32_t* tv = indices + 3 * t;
    const float *p0 = positions + 3 * tv[0], *p1 = positions + 3 * tv[1],
                *p2 = positions + 3 * tv[2];
    double ux = p1[0] - p0[0], uy = p1[1] - p0[1], uz = p1[2] - p0[2];
    double vx = p2[0] - p0[0], vy = p2[1] - p0[1], vz = p2[2] - p0[2];
    double nx = uy * vz - uz * vy, ny = uz * vx - ux * vz, nz = ux * vy - uy * vx;
    double len = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (len < 1e-20) continue;
    double area = len * 0.5;
    nx /= len; ny /= len; nz /= len;
    double d = -(nx * p0[0] + ny * p0[1] + nz * p0[2]);
    for (int k = 0; k < 3; k++) {
      q[tv[k]].add_plane(nx, ny, nz, d, area);
      edge_faces[ekey(tv[k], tv[(k + 1) % 3])]++;
    }
  }

  // boundary penalty: perpendicular plane through each boundary edge
  for (int t = 0; t < tri_count; t++) {
    const uint32_t* tv = indices + 3 * t;
    for (int k = 0; k < 3; k++) {
      uint32_t a = tv[k], b = tv[(k + 1) % 3];
      if (edge_faces[ekey(a, b)] != 1) continue;
      const float *pa = positions + 3 * a, *pb = positions + 3 * b;
      const float* pc = positions + 3 * tv[(k + 2) % 3];
      double ex = pb[0] - pa[0], ey = pb[1] - pa[1], ez = pb[2] - pa[2];
      double wx = pc[0] - pa[0], wy = pc[1] - pa[1], wz = pc[2] - pa[2];
      // face normal
      double fx = ey * wz - ez * wy, fy = ez * wx - ex * wz, fz = ex * wy - ey * wx;
      // boundary plane normal = edge x face normal
      double bx = ey * fz - ez * fy, by = ez * fx - ex * fz, bz = ex * fy - ey * fx;
      double bl = std::sqrt(bx * bx + by * by + bz * bz);
      if (bl < 1e-20) continue;
      bx /= bl; by /= bl; bz /= bl;
      double d = -(bx * pa[0] + by * pa[1] + bz * pa[2]);
      double w = (ex * ex + ey * ey + ez * ez) * 100.0;  // strong boundary lock
      q[a].add_plane(bx, by, bz, d, w);
      q[b].add_plane(bx, by, bz, d, w);
    }
  }

  // union-find remap + versions
  std::vector<uint32_t> remap(vertex_count);
  std::vector<uint64_t> version(vertex_count, 0);
  for (int i = 0; i < vertex_count; i++) remap[i] = i;
  std::function<uint32_t(uint32_t)> find = [&](uint32_t v) -> uint32_t {
    while (remap[v] != v) {
      remap[v] = remap[remap[v]];
      v = remap[v];
    }
    return v;
  };

  // vertex -> incident triangle list (by index), live triangle flags
  std::vector<std::vector<int>> vtris(vertex_count);
  std::vector<char> tri_live(tri_count, 1);
  std::vector<std::array<uint32_t, 3>> tri(tri_count);
  for (int t = 0; t < tri_count; t++) {
    for (int k = 0; k < 3; k++) {
      tri[t][k] = indices[3 * t + k];
      vtris[indices[3 * t + k]].push_back(t);
    }
  }
  int live_indices = index_count;

  std::priority_queue<Collapse> heap;
  auto push_edge = [&](uint32_t a, uint32_t b) {
    a = find(a); b = find(b);
    if (a == b) return;
    double ca = q[a].eval(positions + 3 * b);  // move a onto b
    double cb = q[b].eval(positions + 3 * a);  // move b onto a
    Collapse c;
    if (ca <= cb) { c.cost = ca; c.a = a; c.b = b; }
    else { c.cost = cb; c.a = b; c.b = a; }
    c.stamp = version[a] + version[b];
    heap.push(c);
  };
  for (auto& ef : edge_faces) {
    push_edge((uint32_t)(ef.first >> 32), (uint32_t)(ef.first & 0xFFFFFFFF));
  }

  double worst_taken = 0.0;
  while (live_indices > target_index_count && !heap.empty()) {
    Collapse c = heap.top();
    heap.pop();
    uint32_t a = find(c.a), b = find(c.b);
    if (a == b) continue;
    if (c.stamp != version[a] + version[b]) continue;  // stale entry
    if (c.cost > (double)max_error) break;

    // collapse a -> b
    remap[a] = b;
    q[b].add(q[a]);
    version[b]++;
    worst_taken = std::max(worst_taken, c.cost);

    // retire degenerate triangles, migrate a's triangles to b
    std::unordered_set<uint32_t> nbrs;
    for (int t : vtris[a]) {
      if (!tri_live[t]) continue;
      uint32_t v0 = find(tri[t][0]), v1 = find(tri[t][1]), v2 = find(tri[t][2]);
      if (v0 == v1 || v1 == v2 || v0 == v2) {
        tri_live[t] = 0;
        live_indices -= 3;
      } else {
        vtris[b].push_back(t);
      }
    }
    for (int t : vtris[b]) {
      if (!tri_live[t]) continue;
      for (int k = 0; k < 3; k++) {
        uint32_t v = find(tri[t][k]);
        if (v != b) nbrs.insert(v);
      }
    }
    vtris[a].clear();
    for (uint32_t n : nbrs) push_edge(b, n);
  }

  // emit surviving triangles
  int out = 0;
  for (int t = 0; t < tri_count; t++) {
    if (!tri_live[t]) continue;
    uint32_t v0 = find(tri[t][0]), v1 = find(tri[t][1]), v2 = find(tri[t][2]);
    if (v0 == v1 || v1 == v2 || v0 == v2) continue;
    out_indices[out++] = v0;
    out_indices[out++] = v1;
    out_indices[out++] = v2;
  }
  *out_error = (float)std::sqrt(std::max(0.0, worst_taken));
  return out;
}

}  // extern "C"
