// Native NIfTI volume loader — the C++ data-path component.
//
// The reference's data loading rides nibabel + DataLoader worker
// processes (reference src/utils/vqvae.py:206-210, 391-467); the hot
// host-side cost for 160×224×160 volumes is gzip inflation, dtype
// conversion and intensity normalization.  This library fuses those
// into a single pass per volume:
//
//   gzip/plain read (zlib gzFile handles both) → NIfTI-1 header parse
//   → dtype → float32 with scl_slope/inter applied → optional min-max
//   [0, 1] normalization, writing straight into the caller-provided
//   (numpy) buffer plus the 4×4 sform/qform affine.
//
// Exposed as a plain C ABI consumed via ctypes
// (synthanatomy_tpu/native/__init__.py) — no pybind11 needed.
//
// Build: g++ -O3 -march=native -shared -fPIC nifti_loader.cpp -lz
//
// Error codes: 0 ok; -1 open; -2 header; -3 dtype; -4 capacity;
// -5 payload truncated.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <zlib.h>

namespace {

struct NiftiHeader {
  int32_t sizeof_hdr;
  int64_t shape[3];
  int16_t datatype;
  float pixdim[8];
  float vox_offset;
  float scl_slope, scl_inter;
  int16_t qform_code, sform_code;
  float quatern[3], qoffset[3];
  float srow[3][4];
  bool swap;  // byte-swapped file
};

template <typename T>
T bswap(T v) {
  union {
    T val;
    unsigned char b[sizeof(T)];
  } s, d;
  s.val = v;
  for (size_t i = 0; i < sizeof(T); ++i) d.b[i] = s.b[sizeof(T) - 1 - i];
  return d.val;
}

template <typename T>
T rd(const unsigned char* p, bool swap) {
  T v;
  std::memcpy(&v, p, sizeof(T));
  return swap ? bswap(v) : v;
}

int parse_header(const unsigned char* h, NiftiHeader* out) {
  int32_t sz;
  std::memcpy(&sz, h, 4);
  bool swap = false;
  if (sz != 348) {
    sz = bswap(sz);
    if (sz != 348) return -2;
    swap = true;
  }
  if (!((h[344] == 'n' && (h[345] == '+' || h[345] == 'i')))) return -2;
  out->swap = swap;
  int16_t ndim = rd<int16_t>(h + 40, swap);
  if (ndim < 3) {
    // accept 2D by promoting a singleton dim
    out->shape[2] = 1;
  }
  for (int i = 0; i < 3; ++i)
    out->shape[i] = rd<int16_t>(h + 42 + 2 * i, swap);
  out->datatype = rd<int16_t>(h + 70, swap);
  for (int i = 0; i < 8; ++i)
    out->pixdim[i] = rd<float>(h + 76 + 4 * i, swap);
  out->vox_offset = rd<float>(h + 108, swap);
  out->scl_slope = rd<float>(h + 112, swap);
  out->scl_inter = rd<float>(h + 116, swap);
  out->qform_code = rd<int16_t>(h + 252, swap);
  out->sform_code = rd<int16_t>(h + 254, swap);
  for (int i = 0; i < 3; ++i) out->quatern[i] = rd<float>(h + 256 + 4 * i, swap);
  for (int i = 0; i < 3; ++i) out->qoffset[i] = rd<float>(h + 268 + 4 * i, swap);
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 4; ++c)
      out->srow[r][c] = rd<float>(h + 280 + 16 * r + 4 * c, swap);
  return 0;
}

template <typename T>
void convert(const unsigned char* src, float* dst, int64_t n, bool swap,
             float slope, float inter) {
  const T* s = reinterpret_cast<const T*>(src);
  if (slope == 0.0f) slope = 1.0f;
  for (int64_t i = 0; i < n; ++i) {
    T v = s[i];
    if (swap && sizeof(T) > 1) v = bswap(v);
    dst[i] = static_cast<float>(v) * slope + inter;
  }
}

void affine_from_header(const NiftiHeader& h, float* affine16) {
  float A[4][4] = {{0}};
  if (h.sform_code > 0) {
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 4; ++c) A[r][c] = h.srow[r][c];
  } else if (h.qform_code > 0) {
    float b = h.quatern[0], c = h.quatern[1], d = h.quatern[2];
    float a2 = 1.0f - (b * b + c * c + d * d);
    float a = a2 > 0 ? std::sqrt(a2) : 0.0f;
    float R[3][3] = {
        {a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)},
        {2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)},
        {2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c}};
    float qfac = h.pixdim[0] < 0 ? -1.0f : 1.0f;
    float Z[3] = {h.pixdim[1], h.pixdim[2], h.pixdim[3] * qfac};
    for (int r = 0; r < 3; ++r) {
      for (int cc = 0; cc < 3; ++cc) A[r][cc] = R[r][cc] * Z[cc];
      A[r][3] = h.qoffset[r];
    }
  } else {
    A[0][0] = h.pixdim[1];
    A[1][1] = h.pixdim[2];
    A[2][2] = h.pixdim[3];
  }
  A[3][3] = 1.0f;
  std::memcpy(affine16, A, 16 * sizeof(float));
}

}  // namespace

extern "C" {

// Read only the dims (for buffer allocation).
int sat_nifti_shape(const char* path, int64_t* shape3) {
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  unsigned char hdr[352];
  int got = gzread(f, hdr, 352);
  gzclose(f);
  if (got < 348) return -2;
  NiftiHeader h;
  int rc = parse_header(hdr, &h);
  if (rc) return rc;
  for (int i = 0; i < 3; ++i) shape3[i] = h.shape[i];
  return 0;
}

// Full decode into `out` (capacity floats, C-order from F-order file —
// i.e. out is indexed out[x + nx*(y + ny*z)], matching numpy
// reshape(shape, order='F')).  affine16 gets the row-major 4×4 affine.
int sat_load_nifti(const char* path, float* out, int64_t capacity,
                   int64_t* shape3, float* affine16, int normalize) {
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  unsigned char hdr[352];
  if (gzread(f, hdr, 352) < 348) {
    gzclose(f);
    return -2;
  }
  NiftiHeader h;
  int rc = parse_header(hdr, &h);
  if (rc) {
    gzclose(f);
    return rc;
  }
  int64_t n = h.shape[0] * h.shape[1] * h.shape[2];
  if (n <= 0 || n > capacity) {
    gzclose(f);
    return -4;
  }

  int itemsize;
  switch (h.datatype) {
    case 2: itemsize = 1; break;    // uint8
    case 256: itemsize = 1; break;  // int8
    case 4: itemsize = 2; break;    // int16
    case 512: itemsize = 2; break;  // uint16
    case 8: itemsize = 4; break;    // int32
    case 768: itemsize = 4; break;  // uint32
    case 16: itemsize = 4; break;   // float32
    case 64: itemsize = 8; break;   // float64
    default: gzclose(f); return -3;
  }

  // skip to vox_offset
  int64_t off = static_cast<int64_t>(h.vox_offset);
  if (off > 352) {
    std::vector<unsigned char> skip(off - 352);
    if (gzread(f, skip.data(), skip.size()) != (int)skip.size()) {
      gzclose(f);
      return -5;
    }
  }

  std::vector<unsigned char> raw(n * itemsize);
  int64_t want = n * itemsize, got_total = 0;
  while (got_total < want) {
    int chunk = (int)std::min<int64_t>(want - got_total, 1 << 28);
    int got = gzread(f, raw.data() + got_total, chunk);
    if (got <= 0) break;
    got_total += got;
  }
  gzclose(f);
  if (got_total != want) return -5;

  float slope = h.scl_slope, inter = h.scl_inter;
  bool scale = !(slope == 0.0f || slope == 1.0f) || inter != 0.0f;
  float s = scale ? slope : 1.0f, in = scale ? inter : 0.0f;
  switch (h.datatype) {
    case 2: convert<uint8_t>(raw.data(), out, n, h.swap, s, in); break;
    case 256: convert<int8_t>(raw.data(), out, n, h.swap, s, in); break;
    case 4: convert<int16_t>(raw.data(), out, n, h.swap, s, in); break;
    case 512: convert<uint16_t>(raw.data(), out, n, h.swap, s, in); break;
    case 8: convert<int32_t>(raw.data(), out, n, h.swap, s, in); break;
    case 768: convert<uint32_t>(raw.data(), out, n, h.swap, s, in); break;
    case 16: convert<float>(raw.data(), out, n, h.swap, s, in); break;
    case 64: convert<double>(raw.data(), out, n, h.swap, s, in); break;
  }

  if (normalize) {
    float lo = out[0], hi = out[0];
    for (int64_t i = 1; i < n; ++i) {
      float v = out[i];
      if (v < lo) lo = v;
      if (v > hi) hi = v;
    }
    float range = hi - lo;
    if (range < 1e-12f) {
      for (int64_t i = 0; i < n; ++i) out[i] = 0.0f;
    } else {
      float inv = 1.0f / range;
      for (int64_t i = 0; i < n; ++i) out[i] = (out[i] - lo) * inv;
    }
  }

  for (int i = 0; i < 3; ++i) shape3[i] = h.shape[i];
  affine_from_header(h, affine16);
  return 0;
}

}  // extern "C"
