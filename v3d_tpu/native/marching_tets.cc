// Marching tetrahedra on a dense SDF grid — native core for
// v3d_tpu/meshops/mcubes.py (replaces torchmcubes/mcubes used by
// mesh_recon/models/geometry.py:32-113 at export time).
//
// The numpy implementation materializes (cells x 8) corner tensors —
// gigabytes at the reference's 384^3 marching resolution; this streams the
// grid once with O(1) extra memory per cell and welds vertices via an
// edge-keyed hash map.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 marching_tets.cc -o libmtets.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

// 6 tetrahedra per cube; corners indexed as bit-packed (x, y, z) offsets
// matching the python table in meshops/mcubes.py
const int kCorners[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                            {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
const int kTets[6][4] = {{0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
                         {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

struct Mesh {
  std::vector<float> verts;
  std::vector<int32_t> faces;
  std::unordered_map<uint64_t, int32_t> edge_cache;
};

inline uint64_t EdgeKey(uint32_t a, uint32_t b) {
  if (a > b) std::swap(a, b);
  return (static_cast<uint64_t>(a) << 32) | b;
}

int32_t EdgeVertex(Mesh* m, uint32_t ia, uint32_t ib, const V3& pa,
                   const V3& pb, float va, float vb) {
  uint64_t key = EdgeKey(ia, ib);
  auto it = m->edge_cache.find(key);
  if (it != m->edge_cache.end()) return it->second;
  float t = va / (va - vb + 1e-12f);
  if (t < 0.f) t = 0.f;
  if (t > 1.f) t = 1.f;
  V3 p{pa.x + t * (pb.x - pa.x), pa.y + t * (pb.y - pa.y),
       pa.z + t * (pb.z - pa.z)};
  int32_t idx = static_cast<int32_t>(m->verts.size() / 3);
  m->verts.push_back(p.x);
  m->verts.push_back(p.y);
  m->verts.push_back(p.z);
  m->edge_cache.emplace(key, idx);
  return idx;
}

void EmitTri(Mesh* m, int32_t a, int32_t b, int32_t c, const V3& ref_pt,
             bool ref_inside) {
  // orient so the normal points away from the inside
  const float* va = &m->verts[3 * a];
  const float* vb = &m->verts[3 * b];
  const float* vc = &m->verts[3 * c];
  float e1[3] = {vb[0] - va[0], vb[1] - va[1], vb[2] - va[2]};
  float e2[3] = {vc[0] - va[0], vc[1] - va[1], vc[2] - va[2]};
  float n[3] = {e1[1] * e2[2] - e1[2] * e2[1], e1[2] * e2[0] - e1[0] * e2[2],
                e1[0] * e2[1] - e1[1] * e2[0]};
  float to_ref[3] = {ref_pt.x - va[0], ref_pt.y - va[1], ref_pt.z - va[2]};
  float d = n[0] * to_ref[0] + n[1] * to_ref[1] + n[2] * to_ref[2];
  bool flip = ref_inside ? (d > 0) : (d < 0);
  if (flip) std::swap(b, c);
  m->faces.push_back(a);
  m->faces.push_back(b);
  m->faces.push_back(c);
}

}  // namespace

extern "C" {

// sdf: (nx*ny*nz) row-major float grid; outputs are malloc'd by the callee
// and must be released with mtets_free.
int mtets_run(const float* sdf, int nx, int ny, int nz, float level,
              float** out_verts, int64_t* n_verts, int32_t** out_faces,
              int64_t* n_faces) {
  Mesh mesh;
  auto grid = [&](int x, int y, int z) -> float {
    return sdf[(static_cast<int64_t>(x) * ny + y) * nz + z] - level;
  };
  auto gid = [&](int x, int y, int z) -> uint32_t {
    return (static_cast<uint32_t>(x) * ny + y) * nz + z;
  };

  for (int x = 0; x + 1 < nx; ++x) {
    for (int y = 0; y + 1 < ny; ++y) {
      for (int z = 0; z + 1 < nz; ++z) {
        float vals[8];
        V3 pos[8];
        uint32_t ids[8];
        bool any_neg = false, any_pos = false;
        for (int c = 0; c < 8; ++c) {
          int cx = x + kCorners[c][0];
          int cy = y + kCorners[c][1];
          int cz = z + kCorners[c][2];
          vals[c] = grid(cx, cy, cz);
          pos[c] = V3{static_cast<float>(cx), static_cast<float>(cy),
                      static_cast<float>(cz)};
          ids[c] = gid(cx, cy, cz);
          (vals[c] < 0 ? any_neg : any_pos) = true;
        }
        if (!any_neg || !any_pos) continue;

        for (const auto& tet : kTets) {
          int inside[4], n_in = 0;
          int outside[4], n_out = 0;
          for (int i = 0; i < 4; ++i) {
            if (vals[tet[i]] < 0)
              inside[n_in++] = tet[i];
            else
              outside[n_out++] = tet[i];
          }
          if (n_in == 0 || n_in == 4) continue;
          auto EV = [&](int a, int b) {
            return EdgeVertex(&mesh, ids[a], ids[b], pos[a], pos[b], vals[a],
                              vals[b]);
          };
          if (n_in == 1) {
            int a = inside[0];
            V3 ref = pos[a];
            EmitTri(&mesh, EV(a, outside[0]), EV(a, outside[1]),
                    EV(a, outside[2]), ref, /*ref_inside=*/true);
          } else if (n_in == 3) {
            int a = outside[0];
            V3 ref = pos[a];
            EmitTri(&mesh, EV(inside[0], a), EV(inside[1], a),
                    EV(inside[2], a), ref, /*ref_inside=*/false);
          } else {  // 2-2: quad split into two triangles
            int i0 = inside[0], i1 = inside[1];
            int o0 = outside[0], o1 = outside[1];
            int32_t e00 = EV(i0, o0), e01 = EV(i0, o1);
            int32_t e10 = EV(i1, o0), e11 = EV(i1, o1);
            V3 ref{(pos[i0].x + pos[i1].x) * 0.5f,
                   (pos[i0].y + pos[i1].y) * 0.5f,
                   (pos[i0].z + pos[i1].z) * 0.5f};
            EmitTri(&mesh, e00, e01, e11, ref, true);
            EmitTri(&mesh, e00, e11, e10, ref, true);
          }
        }
      }
    }
  }

  *n_verts = static_cast<int64_t>(mesh.verts.size() / 3);
  *n_faces = static_cast<int64_t>(mesh.faces.size() / 3);
  *out_verts = static_cast<float*>(malloc(mesh.verts.size() * sizeof(float)));
  *out_faces =
      static_cast<int32_t*>(malloc(mesh.faces.size() * sizeof(int32_t)));
  if (!*out_verts || !*out_faces) return -1;
  std::memcpy(*out_verts, mesh.verts.data(), mesh.verts.size() * sizeof(float));
  std::memcpy(*out_faces, mesh.faces.data(),
              mesh.faces.size() * sizeof(int32_t));
  return 0;
}

void mtets_free(void* p) { free(p); }

}  // extern "C"
