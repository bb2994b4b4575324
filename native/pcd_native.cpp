// Native host-side accelerators for gpd_tpu.
//
// The reference's host runtime is C++ (PCL-based file I/O and containers,
// reference: src/gpd/util/cloud.cpp); this library provides the
// corresponding native fast paths for the TPU framework's host side:
//   - parse_ascii_floats: bulk whitespace-separated float parsing for ascii
//     PCD/PLY bodies (the dominant host cost when loading large clouds),
//   - lzf_decompress: PCL binary_compressed PCD body decompression,
//   - voxel_downsample_host: CPU fallback voxel filter with the reference's
//     cell semantics (cloud.cpp:286-348), for tools that run without a
//     device.
//
// Build: see native/build.sh (g++ -O3 -shared). Loaded from Python via
// ctypes (gpd_tpu/io/pcd.py); every entry point has a pure-NumPy fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Parse up to max_out whitespace-separated floats from text[0..len).
// Returns the number parsed, or -1 on malformed input.
long long parse_ascii_floats(const char* text, long long len, float* out,
                             long long max_out) {
  const char* p = text;
  const char* end = text + len;
  long long n = 0;
  while (p < end && n < max_out) {
    // Skip whitespace.
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) {
      ++p;
    }
    if (p >= end) break;
    char* next = nullptr;
    float v = strtof(p, &next);
    if (next == p) {
      // Not a number (e.g. "nan" handled by strtof; other garbage -> skip
      // token to stay robust against comments).
      while (p < end && !(*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) {
        ++p;
      }
      continue;
    }
    out[n++] = v;
    p = next;
  }
  return n;
}

// LZF decompression (PCL binary_compressed bodies). Returns bytes written
// or -1 on overrun.
long long lzf_decompress(const unsigned char* in, long long in_len,
                         unsigned char* out, long long out_len) {
  long long i = 0, o = 0;
  while (i < in_len) {
    unsigned int ctrl = in[i++];
    if (ctrl < 32) {
      long long run = ctrl + 1;
      if (i + run > in_len || o + run > out_len) return -1;
      memcpy(out + o, in + i, run);
      i += run;
      o += run;
    } else {
      long long length = ctrl >> 5;
      if (length == 7) {
        if (i >= in_len) return -1;
        length += in[i++];
      }
      if (i >= in_len) return -1;
      long long ref = o - ((ctrl & 0x1F) << 8) - in[i++] - 1;
      if (ref < 0 || o + length + 2 > out_len) return -1;
      for (long long k = 0; k < length + 2; ++k) {
        out[o] = out[ref];
        ++o;
        ++ref;
      }
    }
  }
  return o;
}

// Host voxel filter with the reference's semantics (cloud.cpp:286-348):
// first point per cell is the representative; output = voxel corners in
// lexicographic cell order. points: n x 3 row-major. out_points must hold
// 3*n floats. Returns the number of output points.
long long voxel_downsample_host(const float* points, long long n,
                                float cell_size, float* out_points,
                                int* rep_indices) {
  if (n == 0) return 0;
  float mn[3] = {points[0], points[1], points[2]};
  for (long long i = 1; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      float v = points[3 * i + d];
      if (v < mn[d]) mn[d] = v;
    }
  }
  struct Cell {
    int32_t x, y, z;
    bool operator==(const Cell& o) const {
      return x == o.x && y == o.y && z == o.z;
    }
  };
  struct CellHash {
    size_t operator()(const Cell& c) const {
      return (size_t)c.x * 73856093u ^ (size_t)c.y * 19349663u ^
             (size_t)c.z * 83492791u;
    }
  };
  std::unordered_map<Cell, long long, CellHash> first;
  first.reserve((size_t)n);
  std::vector<Cell> cells;
  cells.reserve((size_t)n);
  for (long long i = 0; i < n; ++i) {
    Cell c;
    c.x = (int32_t)floorf((points[3 * i + 0] - mn[0]) / cell_size);
    c.y = (int32_t)floorf((points[3 * i + 1] - mn[1]) / cell_size);
    c.z = (int32_t)floorf((points[3 * i + 2] - mn[2]) / cell_size);
    auto it = first.emplace(c, i);
    if (it.second) cells.push_back(c);
  }
  // Lexicographic order to match std::set iteration in the reference.
  std::sort(cells.begin(), cells.end(), [](const Cell& a, const Cell& b) {
    if (a.x != b.x) return a.x < b.x;
    if (a.y != b.y) return a.y < b.y;
    return a.z < b.z;
  });
  long long m = (long long)cells.size();
  for (long long i = 0; i < m; ++i) {
    const Cell& c = cells[(size_t)i];
    out_points[3 * i + 0] = mn[0] + cell_size * (float)c.x;
    out_points[3 * i + 1] = mn[1] + cell_size * (float)c.y;
    out_points[3 * i + 2] = mn[2] + cell_size * (float)c.z;
    if (rep_indices) rep_indices[i] = (int)first[c];
  }
  return m;
}

}  // extern "C"
