// Marching-tetrahedra isosurface extraction (native fast path).
//
// Same algorithm and conventions as the numpy reference implementation in
// ops/isosurface.py (see its docstring): 6-tet cube decomposition sharing the
// main diagonal, programmatically-built 16-case table, linear interpolation
// on tet edges, vertex welding by undirected grid-edge key, triangle
// orientation towards increasing field values. This replaces the reference's
// torchmcubes/PyMCubes native dependency (reference: models/geometry.py:38-43).
//
// Exposed via ctypes (see ops/native/__init__.py): mt_run / mt_counts /
// mt_fetch / mt_free.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct MeshResult {
  std::vector<float> verts;    // 3 * V
  std::vector<int64_t> faces;  // 3 * F
};

const int kCorner[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
};

const int kTets[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
};

const int kTetEdges[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};

int edge_of_pair(int a, int b) {
  for (int e = 0; e < 6; ++e) {
    if ((kTetEdges[e][0] == a && kTetEdges[e][1] == b) ||
        (kTetEdges[e][0] == b && kTetEdges[e][1] == a))
      return e;
  }
  return -1;
}

struct TetTable {
  // tris[mask][k][3] = tet-edge ids, -1 padded
  int tris[16][2][3];
  TetTable() {
    std::memset(tris, -1, sizeof(tris));
    for (int mask = 1; mask < 15; ++mask) {
      int inside[4], outside[4], ni = 0, no = 0;
      for (int v = 0; v < 4; ++v) {
        if ((mask >> v) & 1)
          inside[ni++] = v;
        else
          outside[no++] = v;
      }
      if (ni == 1) {
        for (int j = 0; j < 3; ++j)
          tris[mask][0][j] = edge_of_pair(inside[0], outside[j]);
      } else if (ni == 3) {
        for (int j = 0; j < 3; ++j)
          tris[mask][0][j] = edge_of_pair(outside[0], inside[j]);
      } else {  // ni == 2: quad split into 2 triangles
        int q[4] = {edge_of_pair(inside[0], outside[0]),
                    edge_of_pair(inside[0], outside[1]),
                    edge_of_pair(inside[1], outside[1]),
                    edge_of_pair(inside[1], outside[0])};
        tris[mask][0][0] = q[0];
        tris[mask][0][1] = q[1];
        tris[mask][0][2] = q[2];
        tris[mask][1][0] = q[0];
        tris[mask][1][1] = q[2];
        tris[mask][1][2] = q[3];
      }
    }
  }
};

const TetTable kTable;

inline void id_to_xyz(int64_t id, int64_t ry, int64_t rz, float* out) {
  out[0] = static_cast<float>(id / (ry * rz));
  out[1] = static_cast<float>((id / rz) % ry);
  out[2] = static_cast<float>(id % rz);
}

}  // namespace

extern "C" {

// Runs extraction; returns an opaque handle (or nullptr on failure).
void* mt_run(const float* values, int64_t rx, int64_t ry, int64_t rz,
             float iso) {
  auto* res = new MeshResult();
  if (rx < 2 || ry < 2 || rz < 2) return res;

  auto at = [&](int64_t x, int64_t y, int64_t z) -> float {
    return values[(x * ry + y) * rz + z];
  };

  // weld map: undirected grid edge (lo, hi) -> vertex index
  std::unordered_map<int64_t, int64_t> weld;
  weld.reserve(1 << 16);
  const int64_t n_total = rx * ry * rz;

  std::vector<float> vals(n_total);
  std::memcpy(vals.data(), values, n_total * sizeof(float));

  int64_t corner_off[8];
  for (int c = 0; c < 8; ++c)
    corner_off[c] =
        (int64_t)kCorner[c][0] * ry * rz + (int64_t)kCorner[c][1] * rz +
        (int64_t)kCorner[c][2];

  for (int64_t x = 0; x < rx - 1; ++x) {
    for (int64_t y = 0; y < ry - 1; ++y) {
      for (int64_t z = 0; z < rz - 1; ++z) {
        const int64_t origin = (x * ry + y) * rz + z;
        float lo = 1e30f, hi = -1e30f;
        int64_t cube_vid[8];
        float cube_val[8];
        for (int c = 0; c < 8; ++c) {
          cube_vid[c] = origin + corner_off[c];
          const float v = vals[cube_vid[c]];
          cube_val[c] = v;
          lo = v < lo ? v : lo;
          hi = v > hi ? v : hi;
        }
        if (!(lo < iso && hi >= iso)) continue;

        for (int t = 0; t < 6; ++t) {
          int64_t tv[4];
          float tval[4];
          int mask = 0;
          for (int j = 0; j < 4; ++j) {
            tv[j] = cube_vid[kTets[t][j]];
            tval[j] = cube_val[kTets[t][j]];
            if (tval[j] < iso) mask |= 1 << j;
          }
          if (mask == 0 || mask == 15) continue;

          for (int k = 0; k < 2; ++k) {
            if (kTable.tris[mask][k][0] < 0) continue;
            int64_t fidx[3];
            for (int j = 0; j < 3; ++j) {
              const int e = kTable.tris[mask][k][j];
              const int la = kTetEdges[e][0], lb = kTetEdges[e][1];
              int64_t ga = tv[la], gb = tv[lb];
              if (ga > gb) std::swap(ga, gb);
              const int64_t key = ga * n_total + gb;
              auto it = weld.find(key);
              if (it == weld.end()) {
                const float va = vals[ga], vb = vals[gb];
                const float denom = vb - va;
                float tt = std::fabs(denom) > 1e-12f ? (iso - va) / denom : 0.5f;
                tt = tt < 0.f ? 0.f : (tt > 1.f ? 1.f : tt);
                float pa[3], pb[3];
                id_to_xyz(ga, ry, rz, pa);
                id_to_xyz(gb, ry, rz, pb);
                const int64_t vid = (int64_t)(res->verts.size() / 3);
                for (int d = 0; d < 3; ++d)
                  res->verts.push_back(pa[d] + tt * (pb[d] - pa[d]));
                weld.emplace(key, vid);
                fidx[j] = vid;
              } else {
                fidx[j] = it->second;
              }
            }
            if (fidx[0] == fidx[1] || fidx[1] == fidx[2] || fidx[0] == fidx[2])
              continue;

            // orient towards increasing field (central differences at the
            // rounded centroid)
            float cx = 0.f, cy = 0.f, cz = 0.f;
            for (int j = 0; j < 3; ++j) {
              cx += res->verts[3 * fidx[j] + 0];
              cy += res->verts[3 * fidx[j] + 1];
              cz += res->verts[3 * fidx[j] + 2];
            }
            cx /= 3.f; cy /= 3.f; cz /= 3.f;
            auto clampi = [](int64_t v, int64_t lo_, int64_t hi_) {
              return v < lo_ ? lo_ : (v > hi_ ? hi_ : v);
            };
            const int64_t gx = clampi((int64_t)std::lround(cx), 1, rx - 2);
            const int64_t gy = clampi((int64_t)std::lround(cy), 1, ry - 2);
            const int64_t gz = clampi((int64_t)std::lround(cz), 1, rz - 2);
            const float dgx = at(gx + 1, gy, gz) - at(gx - 1, gy, gz);
            const float dgy = at(gx, gy + 1, gz) - at(gx, gy - 1, gz);
            const float dgz = at(gx, gy, gz + 1) - at(gx, gy, gz - 1);
            const float* p0 = &res->verts[3 * fidx[0]];
            const float* p1 = &res->verts[3 * fidx[1]];
            const float* p2 = &res->verts[3 * fidx[2]];
            const float e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
            const float e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
            const float nx_ = e1[1] * e2[2] - e1[2] * e2[1];
            const float ny_ = e1[2] * e2[0] - e1[0] * e2[2];
            const float nz_ = e1[0] * e2[1] - e1[1] * e2[0];
            const bool flip = nx_ * dgx + ny_ * dgy + nz_ * dgz < 0.f;
            if (flip) {
              res->faces.push_back(fidx[2]);
              res->faces.push_back(fidx[1]);
              res->faces.push_back(fidx[0]);
            } else {
              res->faces.push_back(fidx[0]);
              res->faces.push_back(fidx[1]);
              res->faces.push_back(fidx[2]);
            }
          }
        }
      }
    }
  }
  return res;
}

void mt_counts(void* handle, int64_t* n_verts, int64_t* n_faces) {
  auto* res = static_cast<MeshResult*>(handle);
  *n_verts = (int64_t)(res->verts.size() / 3);
  *n_faces = (int64_t)(res->faces.size() / 3);
}

void mt_fetch(void* handle, float* verts_out, int64_t* faces_out) {
  auto* res = static_cast<MeshResult*>(handle);
  std::memcpy(verts_out, res->verts.data(), res->verts.size() * sizeof(float));
  std::memcpy(faces_out, res->faces.data(),
              res->faces.size() * sizeof(int64_t));
}

void mt_free(void* handle) { delete static_cast<MeshResult*>(handle); }

}  // extern "C"
