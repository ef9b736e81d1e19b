// scenecore: native host runtime for the TPU path tracer.
//
// The reference's host-side scene pipeline is C# (BVH build Scene.cs:405-510,
// OBJ parse MeshLoaderOBJ.cs); this is the TPU framework's native equivalent
// for the heavy host paths: skip-index BVH construction (median split with
// the exact traversal contract, plus binned-SAH as a quality option) and
// refit. Exposed via a C ABI consumed through ctypes
// (ilgpu_raytracing_tpu/native).
//
// Contract (must match models/bvh.py build_skip_index_bvh):
//  * node emitted pre-order; RIGHT subtree emitted before LEFT so the left
//    subtree's miss pointer is the right root;
//  * leaf prim ids appended to a growing indirection list, `first` indexes it;
//  * int fields packed (left, first, count, skip).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint32_t expand_bits10(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

struct Builder {
  const float* bmin;      // (P,3)
  const float* bmax;      // (P,3)
  const float* centroid;  // (P,3)
  int32_t leaf_size;
  int method;  // 0 = median split, 1 = binned SAH, 2 = LBVH (morton order)
  std::vector<uint32_t> morton;  // method 2: per-prim 30-bit codes
  std::vector<int32_t> ids;
  float* node_bmin;      // (cap,3)
  float* node_bmax;      // (cap,3)
  int32_t* node_ifields;  // (cap,4)
  int32_t* leaf_order;    // (P,)
  int32_t node_count = 0;
  int32_t leaf_len = 0;

  static constexpr int kSahBins = 16;

  void bounds_of(const int32_t* b, const int32_t* e, float* mn, float* mx) {
    for (int a = 0; a < 3; ++a) {
      mn[a] = 3.4e38f;
      mx[a] = -3.4e38f;
    }
    for (const int32_t* it = b; it != e; ++it) {
      const float* lo = bmin + 3 * (*it);
      const float* hi = bmax + 3 * (*it);
      for (int a = 0; a < 3; ++a) {
        mn[a] = std::min(mn[a], lo[a]);
        mx[a] = std::max(mx[a], hi[a]);
      }
    }
  }

  // reference axis pick: x unless y/z strictly larger (Scene.cs:447-450)
  static int largest_axis(const float* ext) {
    int axis = 0;
    if (ext[1] > ext[0] && ext[1] >= ext[2]) axis = 1;
    else if (ext[2] > ext[0] && ext[2] >= ext[1]) axis = 2;
    return axis;
  }

  // Binned SAH split of [b, e); returns partition point or nullptr for
  // no-good-split (fall back to median).
  int32_t* sah_split(int32_t* b, int32_t* e, const float* mn, const float* mx,
                     int axis) {
    const float lo = mn[axis], hi = mx[axis];
    if (hi - lo < 1e-12f) return nullptr;
    const float inv = kSahBins / (hi - lo);
    int counts[kSahBins] = {0};
    float bb_min[kSahBins][3], bb_max[kSahBins][3];
    for (int i = 0; i < kSahBins; ++i)
      for (int a = 0; a < 3; ++a) {
        bb_min[i][a] = 3.4e38f;
        bb_max[i][a] = -3.4e38f;
      }
    for (int32_t* it = b; it != e; ++it) {
      int bi = std::min(kSahBins - 1,
                        std::max(0, int((centroid[3 * *it + axis] - lo) * inv)));
      counts[bi]++;
      const float* pl = bmin + 3 * (*it);
      const float* ph = bmax + 3 * (*it);
      for (int a = 0; a < 3; ++a) {
        bb_min[bi][a] = std::min(bb_min[bi][a], pl[a]);
        bb_max[bi][a] = std::max(bb_max[bi][a], ph[a]);
      }
    }
    auto area = [](const float* mn2, const float* mx2) {
      float dx = std::max(0.f, mx2[0] - mn2[0]);
      float dy = std::max(0.f, mx2[1] - mn2[1]);
      float dz = std::max(0.f, mx2[2] - mn2[2]);
      return dx * dy + dy * dz + dz * dx;
    };
    float suff_cost[kSahBins];
    // suffix sweep
    {
      float rm[3] = {3.4e38f, 3.4e38f, 3.4e38f};
      float rM[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
      int rc = 0;
      for (int i = kSahBins - 1; i >= 1; --i) {
        for (int a = 0; a < 3; ++a) {
          rm[a] = std::min(rm[a], bb_min[i][a]);
          rM[a] = std::max(rM[a], bb_max[i][a]);
        }
        rc += counts[i];
        suff_cost[i] = rc > 0 ? area(rm, rM) * rc : 0.f;
      }
    }
    // prefix sweep, pick best
    float best = 3.4e38f;
    int best_bin = -1;
    {
      float lm[3] = {3.4e38f, 3.4e38f, 3.4e38f};
      float lM[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
      int lc = 0;
      for (int i = 0; i < kSahBins - 1; ++i) {
        for (int a = 0; a < 3; ++a) {
          lm[a] = std::min(lm[a], bb_min[i][a]);
          lM[a] = std::max(lM[a], bb_max[i][a]);
        }
        lc += counts[i];
        if (lc == 0 || lc == int(e - b)) continue;
        float cost = area(lm, lM) * lc + suff_cost[i + 1];
        if (cost < best) {
          best = cost;
          best_bin = i;
        }
      }
    }
    if (best_bin < 0) return nullptr;
    const float split = lo + (best_bin + 1) / inv;
    int32_t* mid = std::partition(b, e, [&](int32_t id) {
      return centroid[3 * id + axis] < split;
    });
    if (mid == b || mid == e) return nullptr;
    return mid;
  }

  void compute_morton(int32_t prim_count) {
    float lo[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float hi[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int32_t i = 0; i < prim_count; ++i)
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], centroid[3 * i + a]);
        hi[a] = std::max(hi[a], centroid[3 * i + a]);
      }
    float inv[3];
    for (int a = 0; a < 3; ++a)
      inv[a] = (hi[a] - lo[a]) > 1e-12f ? 1023.f / (hi[a] - lo[a]) : 0.f;
    morton.resize(prim_count);
    for (int32_t i = 0; i < prim_count; ++i) {
      uint32_t q[3];
      for (int a = 0; a < 3; ++a) {
        float t = (centroid[3 * i + a] - lo[a]) * inv[a];
        q[a] = uint32_t(std::min(1023.f, std::max(0.f, t)));
      }
      morton[i] = (expand_bits10(q[0]) << 2) | (expand_bits10(q[1]) << 1) |
                  expand_bits10(q[2]);
    }
  }

  // LBVH split: highest differing morton bit over [b, e) (Karras-style
  // bracketing on the pre-sorted order); falls back to median when the
  // whole range shares one code.
  int32_t* lbvh_split(int32_t* b, int32_t* e) {
    const uint32_t first = morton[*b];
    const uint32_t last = morton[*(e - 1)];
    if (first == last) return b + (e - b) / 2;
    const uint32_t diff = first ^ last;
    int bit = 31;
    while (bit >= 0 && !((diff >> bit) & 1u)) --bit;
    const uint32_t mask = 1u << bit;
    // first element whose bit is set (order is sorted by morton)
    int32_t* mid = std::partition_point(
        b, e, [&](int32_t id) { return (morton[id] & mask) == 0; });
    if (mid == b || mid == e) return b + (e - b) / 2;
    return mid;
  }

  int32_t build(int32_t* b, int32_t* e, int32_t parent_skip) {
    const int32_t node = node_count++;
    float mn[3], mx[3];
    bounds_of(b, e, mn, mx);
    std::memcpy(node_bmin + 3 * node, mn, 12);
    std::memcpy(node_bmax + 3 * node, mx, 12);
    int32_t* f = node_ifields + 4 * node;
    f[0] = -1;
    f[3] = parent_skip;

    const int32_t count = int32_t(e - b);
    if (count <= leaf_size) {
      f[1] = leaf_len;
      f[2] = count;
      std::memcpy(leaf_order + leaf_len, b, count * 4);
      leaf_len += count;
      return node;
    }
    f[1] = -1;
    f[2] = 0;

    float ext[3] = {mx[0] - mn[0], mx[1] - mn[1], mx[2] - mn[2]};
    const int axis = largest_axis(ext);
    int32_t* mid = nullptr;
    if (method == 1) mid = sah_split(b, e, mn, mx, axis);
    if (method == 2) mid = lbvh_split(b, e);
    if (mid == nullptr) {
      mid = b + count / 2;
      std::nth_element(b, mid, e, [&](int32_t a, int32_t c) {
        return centroid[3 * a + axis] < centroid[3 * c + axis];
      });
    }
    const int32_t right_root = build(mid, e, parent_skip);
    const int32_t left_root = build(b, mid, right_root);
    node_ifields[4 * node + 0] = left_root;
    return node;
  }
};

}  // namespace

extern "C" {

// Returns node count (>0) on success, -1 on error. Buffers:
//   node_bmin/node_bmax: capacity 2*P nodes x 3 floats
//   node_ifields: capacity 2*P x 4 int32 (left, first, count, skip)
//   leaf_order: capacity P int32
int32_t sc_build_bvh(const float* bmin, const float* bmax,
                     const float* centroid, int32_t prim_count,
                     int32_t leaf_size, int32_t method, float* node_bmin,
                     float* node_bmax, int32_t* node_ifields,
                     int32_t* leaf_order) {
  if (prim_count <= 0 || leaf_size <= 0) return -1;
  Builder bld;
  bld.bmin = bmin;
  bld.bmax = bmax;
  bld.centroid = centroid;
  bld.leaf_size = leaf_size;
  bld.method = method;
  bld.node_bmin = node_bmin;
  bld.node_bmax = node_bmax;
  bld.node_ifields = node_ifields;
  bld.leaf_order = leaf_order;
  bld.ids.resize(prim_count);
  for (int32_t i = 0; i < prim_count; ++i) bld.ids[i] = i;
  if (method == 2) {
    bld.compute_morton(prim_count);
    std::sort(bld.ids.begin(), bld.ids.end(), [&](int32_t a, int32_t b2) {
      return bld.morton[a] < bld.morton[b2];
    });
  }
  bld.build(bld.ids.data(), bld.ids.data() + prim_count, -1);
  return bld.node_count;
}

// Bottom-up refit: nodes emitted parent-before-children, reverse sweep.
// Right child root is node+1 in emission order.
void sc_refit_bvh(const int32_t* node_ifields, const int32_t* leaf_order,
                  const float* prim_bmin, const float* prim_bmax,
                  int32_t node_count, float* node_bmin, float* node_bmax) {
  for (int32_t i = node_count - 1; i >= 0; --i) {
    const int32_t* f = node_ifields + 4 * i;
    float* mn = node_bmin + 3 * i;
    float* mx = node_bmax + 3 * i;
    if (f[2] > 0) {  // leaf
      for (int a = 0; a < 3; ++a) {
        mn[a] = 3.4e38f;
        mx[a] = -3.4e38f;
      }
      for (int32_t k = 0; k < f[2]; ++k) {
        const int32_t p = leaf_order[f[1] + k];
        for (int a = 0; a < 3; ++a) {
          mn[a] = std::min(mn[a], prim_bmin[3 * p + a]);
          mx[a] = std::max(mx[a], prim_bmax[3 * p + a]);
        }
      }
    } else {
      const int32_t l = f[0], r = i + 1;
      for (int a = 0; a < 3; ++a) {
        mn[a] = std::min(node_bmin[3 * l + a], node_bmin[3 * r + a]);
        mx[a] = std::max(node_bmax[3 * l + a], node_bmax[3 * r + a]);
      }
    }
  }
}

// Triangle bounds + centroids in one pass (feeds sc_build_bvh).
void sc_triangle_bounds(const float* v0, const float* v1, const float* v2,
                        int32_t tri_count, float* bmin, float* bmax,
                        float* centroid) {
  for (int32_t i = 0; i < tri_count; ++i) {
    for (int a = 0; a < 3; ++a) {
      const float x0 = v0[3 * i + a], x1 = v1[3 * i + a], x2 = v2[3 * i + a];
      const float mn = std::min(x0, std::min(x1, x2));
      const float mx = std::max(x0, std::max(x1, x2));
      bmin[3 * i + a] = mn;
      bmax[3 * i + a] = mx;
      centroid[3 * i + a] = (x0 + x1 + x2) / 3.0f;
    }
  }
}

}  // extern "C"
