// rayito_tpu native runtime components.
//
// The TPU compute path is JAX/XLA; this library covers the host-side,
// performance-bearing runtime work the reference implements in C++:
//
//  * BVH construction over triangle soups (the reference's Bvh<T>::build,
//    Rayito_Stage7_QT/RAccel.h:262-372: midpoint split on the widest axis,
//    median fallback on degenerate partitions, leaf = 1 primitive). Here we
//    only need the resulting DFS primitive ORDER — the device consumes
//    fixed-size clusters cut from that order (accel/clusters.py) — so the
//    builder emits exactly that: prim_order.
//
//  * Wavefront OBJ parsing (the reference's createFromOBJFile,
//    OBJMesh.cpp:49-181): v/vn/vt and all four f index forms, 1-based and
//    negative indices, fan triangulation with face ids.
//
// Exposed as a C ABI for ctypes (no pybind11 dependency). Buffers are
// caller-allocated numpy arrays; the library never owns Python memory.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// BVH build
// ---------------------------------------------------------------------------

// Builds the DFS primitive order of a midpoint-split BVH.
//   v0,v1,v2: [n*3] float32 triangle vertices
//   out_order: [n] int32 (preallocated)
//   cut_cap / out_cuts / out_ncuts (optional): when cut_cap > 0, also emits
//     SUBTREE-ALIGNED cluster cut starts — the lo of every maximal subtree
//     with <= cut_cap primitives, in DFS (= increasing lo) order. Clusters
//     cut at these boundaries never straddle a BVH subtree, so their
//     bounding boxes are as tight as the tree itself provides (the device
//     traversal prices a cluster by its slab-hit rate, not its occupancy).
// Returns the tree depth, or -1 on error.
static int bvh_order_impl(const float* v0, const float* v1, const float* v2,
                          int32_t n, int32_t* out_order, int32_t cut_cap,
                          int32_t* out_cuts, int32_t* out_ncuts) {
  if (n <= 0) return -1;
  std::vector<float> bmin(3 * (size_t)n), bmax(3 * (size_t)n),
      cent(3 * (size_t)n);
  for (int32_t i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      float a = v0[3 * (size_t)i + c];
      float b = v1[3 * (size_t)i + c];
      float d = v2[3 * (size_t)i + c];
      float lo = std::min(a, std::min(b, d));
      float hi = std::max(a, std::max(b, d));
      bmin[3 * (size_t)i + c] = lo;
      bmax[3 * (size_t)i + c] = hi;
      cent[3 * (size_t)i + c] = 0.5f * (lo + hi);
    }
    out_order[i] = i;
  }

  struct Range {
    int32_t lo, hi, depth;
    bool parent_big;  // parent count > cut_cap (root counts as big-parented)
  };
  std::vector<Range> stack;
  stack.push_back({0, n, 0, true});
  int max_depth = 0;
  int32_t ncuts = 0;

  while (!stack.empty()) {
    Range r = stack.back();
    stack.pop_back();
    if (r.depth > max_depth) max_depth = r.depth;
    int32_t count = r.hi - r.lo;
    if (cut_cap > 0 && r.parent_big && count <= cut_cap && out_cuts) {
      out_cuts[ncuts++] = r.lo;  // DFS pre-order pops -> increasing lo
    }
    if (count <= 1) continue;

    // node bounds over member prim bounds
    float nb_min[3] = {1e30f, 1e30f, 1e30f};
    float nb_max[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t k = r.lo; k < r.hi; ++k) {
      int32_t p = out_order[k];
      for (int c = 0; c < 3; ++c) {
        nb_min[c] = std::min(nb_min[c], bmin[3 * (size_t)p + c]);
        nb_max[c] = std::max(nb_max[c], bmax[3 * (size_t)p + c]);
      }
    }
    int axis = 0;
    float ext = nb_max[0] - nb_min[0];
    for (int c = 1; c < 3; ++c) {
      float e = nb_max[c] - nb_min[c];
      if (e > ext) {
        ext = e;
        axis = c;
      }
    }
    float mid = 0.5f * (nb_min[axis] + nb_max[axis]);

    int32_t* first = out_order + r.lo;
    int32_t* last = out_order + r.hi;
    int32_t* split = std::partition(first, last, [&](int32_t p) {
      return cent[3 * (size_t)p + axis] < mid;
    });
    int32_t n_left = (int32_t)(split - first);
    if (n_left == 0 || n_left == count) {
      // degenerate spatial split -> median split (RAccel.h:342-350 spirit)
      n_left = count / 2;
      std::nth_element(first, first + n_left, last, [&](int32_t a, int32_t b) {
        return cent[3 * (size_t)a + axis] < cent[3 * (size_t)b + axis];
      });
    }
    bool big = count > cut_cap;
    stack.push_back({r.lo + n_left, r.hi, r.depth + 1, big});
    stack.push_back({r.lo, r.lo + n_left, r.depth + 1, big});
  }
  if (out_ncuts) *out_ncuts = ncuts;
  return max_depth;
}

int rayito_bvh_order(const float* v0, const float* v1, const float* v2,
                     int32_t n, int32_t* out_order) {
  return bvh_order_impl(v0, v1, v2, n, out_order, 0, nullptr, nullptr);
}

// Order + subtree-aligned cluster cut starts (see bvh_order_impl docs).
// out_cuts must have room for n entries; the count lands in *out_ncuts.
int rayito_bvh_order_cuts(const float* v0, const float* v1, const float* v2,
                          int32_t n, int32_t cut_cap, int32_t* out_order,
                          int32_t* out_cuts, int32_t* out_ncuts) {
  if (cut_cap <= 0) return -1;
  return bvh_order_impl(v0, v1, v2, n, out_order, cut_cap, out_cuts,
                        out_ncuts);
}

// ---------------------------------------------------------------------------
// OBJ parsing
// ---------------------------------------------------------------------------

struct ObjData {
  std::vector<float> vertices;   // flat xyz
  std::vector<float> normals;    // flat xyz
  std::vector<int32_t> tri_idx;  // flat 3 per tri
  std::vector<int32_t> tri_nidx; // flat 3 per tri (-1 = none)
  std::vector<int32_t> face_ids; // per tri
};

static int resolve_index(long idx, size_t count) {
  long out = idx > 0 ? idx - 1 : (long)count + idx;
  if (out < 0 || (size_t)out >= count) return -2;  // out of range
  return (int)out;
}

// Parses an OBJ file. Returns an opaque handle (or null). Query sizes, copy
// out, then free.
void* rayito_obj_parse(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  ObjData* data = new ObjData();
  char line[4096];
  int face_id = 0;
  while (std::fgets(line, sizeof(line), f)) {
    char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (s[0] == 'v' && (s[1] == ' ' || s[1] == '\t')) {
      float x, y, z;
      if (std::sscanf(s + 1, "%f %f %f", &x, &y, &z) == 3) {
        data->vertices.push_back(x);
        data->vertices.push_back(y);
        data->vertices.push_back(z);
      }
    } else if (s[0] == 'v' && s[1] == 'n' && (s[2] == ' ' || s[2] == '\t')) {
      float x, y, z;
      if (std::sscanf(s + 2, "%f %f %f", &x, &y, &z) == 3) {
        data->normals.push_back(x);
        data->normals.push_back(y);
        data->normals.push_back(z);
      }
    } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      // collect (vertex, normal) pairs for this polygon
      std::vector<int> fv, fn;
      char* tok = s + 1;
      while (*tok) {
        while (*tok == ' ' || *tok == '\t') ++tok;
        if (*tok == '\0' || *tok == '\n' || *tok == '\r') break;
        char* end = tok;
        while (*end && *end != ' ' && *end != '\t' && *end != '\n' &&
               *end != '\r')
          ++end;
        // token forms: v, v/vt, v//vn, v/vt/vn
        long vi = std::strtol(tok, nullptr, 10);
        long ni = 0;
        bool has_n = false;
        char* slash1 = (char*)memchr(tok, '/', (size_t)(end - tok));
        if (slash1) {
          char* slash2 =
              (char*)memchr(slash1 + 1, '/', (size_t)(end - slash1 - 1));
          if (slash2 && slash2 + 1 < end) {
            ni = std::strtol(slash2 + 1, nullptr, 10);
            has_n = true;
          }
        }
        int rv = resolve_index(vi, data->vertices.size() / 3);
        if (rv == -2) {
          std::fprintf(stderr, "obj: vertex index %ld out of range\n", vi);
        } else {
          int rn = -1;
          if (has_n) {
            rn = resolve_index(ni, data->normals.size() / 3);
            if (rn == -2) {
              std::fprintf(stderr, "obj: normal index %ld out of range\n", ni);
              rn = -1;
            }
          }
          fv.push_back(rv);
          fn.push_back(rn);
        }
        tok = end;
      }
      if (fv.size() >= 3) {
        for (size_t k = 1; k + 1 < fv.size(); ++k) {
          data->tri_idx.push_back(fv[0]);
          data->tri_idx.push_back(fv[k]);
          data->tri_idx.push_back(fv[k + 1]);
          data->tri_nidx.push_back(fn[0]);
          data->tri_nidx.push_back(fn[k]);
          data->tri_nidx.push_back(fn[k + 1]);
          data->face_ids.push_back(face_id);
        }
        ++face_id;
      }
    }
    // '#', o, s, g, usemtl, mtllib, vt: ignored (vt parsed-and-dropped)
  }
  std::fclose(f);
  if (data->vertices.empty()) {
    delete data;
    return nullptr;
  }
  return data;
}

int32_t rayito_obj_num_vertices(void* h) {
  return (int32_t)(((ObjData*)h)->vertices.size() / 3);
}
int32_t rayito_obj_num_normals(void* h) {
  return (int32_t)(((ObjData*)h)->normals.size() / 3);
}
int32_t rayito_obj_num_tris(void* h) {
  return (int32_t)(((ObjData*)h)->tri_idx.size() / 3);
}

void rayito_obj_copy(void* h, float* vertices, float* normals,
                     int32_t* tri_idx, int32_t* tri_nidx, int32_t* face_ids) {
  ObjData* d = (ObjData*)h;
  std::memcpy(vertices, d->vertices.data(),
              d->vertices.size() * sizeof(float));
  if (!d->normals.empty())
    std::memcpy(normals, d->normals.data(), d->normals.size() * sizeof(float));
  std::memcpy(tri_idx, d->tri_idx.data(), d->tri_idx.size() * sizeof(int32_t));
  std::memcpy(tri_nidx, d->tri_nidx.data(),
              d->tri_nidx.size() * sizeof(int32_t));
  std::memcpy(face_ids, d->face_ids.data(),
              d->face_ids.size() * sizeof(int32_t));
}

void rayito_obj_free(void* h) { delete (ObjData*)h; }

}  // extern "C"
