// deepmet_native — host-side native components of deepmetv2_tpu.
//
// The reference delegates its host-side hot paths to C++/CUDA extension
// packages (SURVEY.md §2b).  This library provides the TPU framework's
// host-native tier:
//   * LZ4 block compression/decompression + xxHash32 — artifact codec
//     (the reference persists lz4-frame cloudpickle artifacts,
//     reference utils.py:32-46); Python implements the frame layer,
//     this provides the fast block codec.
//   * Ragged event packing — the ETL/data-loader inner loop
//     (reference model/data_loader.py:63-90): derive px/py, reorder to the
//     11-feature layout, drop -999 pad rows, nan_to_num, clip — performed
//     slice-at-a-time on raw float buffers.
//
// C ABI for ctypes (no pybind11 in this image).  Build: make -C native

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// --------------------------------------------------------------- xxHash32

static const uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                      P4 = 668265263u, P5 = 374761393u;

static inline uint32_t rotl32(uint32_t x, int r) {
  return (x << r) | (x >> (32 - r));
}

static inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86/arm)
}

uint32_t dm_xxh32(const uint8_t* data, uint64_t len, uint32_t seed) {
  const uint8_t* p = data;
  const uint8_t* end = data + len;
  uint32_t h;
  if (len >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 16;
    do {
      v1 = rotl32(v1 + read32(p) * P2, 13) * P1; p += 4;
      v2 = rotl32(v2 + read32(p) * P2, 13) * P1; p += 4;
      v3 = rotl32(v3 + read32(p) * P2, 13) * P1; p += 4;
      v4 = rotl32(v4 + read32(p) * P2, 13) * P1; p += 4;
    } while (p <= limit);
    h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
  } else {
    h = seed + P5;
  }
  h += (uint32_t)len;
  while (p + 4 <= end) {
    h = rotl32(h + read32(p) * P3, 17) * P4;
    p += 4;
  }
  while (p < end) {
    h = rotl32(h + (*p) * P5, 11) * P1;
    ++p;
  }
  h ^= h >> 15; h *= P2;
  h ^= h >> 13; h *= P3;
  h ^= h >> 16;
  return h;
}

// ------------------------------------------------------------ LZ4 blocks

// Greedy hash-table matcher producing standard LZ4 block format
// (token | literals | 2-byte offset | match continuation).
static const int MINMATCH = 4;
static const int HASH_LOG = 16;

static inline uint32_t lz4_hash(uint32_t v) {
  return (v * 2654435761u) >> (32 - HASH_LOG);
}

int64_t dm_lz4_compress(const uint8_t* src, int64_t n, uint8_t* dst,
                        int64_t cap) {
  if (n <= 0 || n >= (1ll << 31)) return -1;
  int32_t table[1 << HASH_LOG];
  std::memset(table, -1, sizeof(table));

  int64_t ip = 0, op = 0, anchor = 0;
  const int64_t mflimit = n - 12;  // spec: last match must start before n-12

  while (ip < mflimit) {
    uint32_t seq = read32(src + ip);
    uint32_t h = lz4_hash(seq);
    int64_t ref = table[h];
    table[h] = (int32_t)ip;
    if (ref >= 0 && ip - ref <= 0xFFFF && read32(src + ref) == seq) {
      // extend match forward
      int64_t mlen = MINMATCH;
      const int64_t matchlimit = n - 5;  // last 5 bytes are literals
      while (ip + mlen < matchlimit && src[ref + mlen] == src[ip + mlen])
        ++mlen;
      int64_t litlen = ip - anchor;
      // emit token + literal length
      int64_t need = 1 + litlen / 255 + 1 + litlen + 2 + (mlen - MINMATCH) / 255 + 1;
      if (op + need >= cap) return -1;
      uint8_t* token = dst + op++;
      if (litlen >= 15) {
        *token = 15 << 4;
        int64_t l = litlen - 15;
        for (; l >= 255; l -= 255) dst[op++] = 255;
        dst[op++] = (uint8_t)l;
      } else {
        *token = (uint8_t)(litlen << 4);
      }
      std::memcpy(dst + op, src + anchor, litlen);
      op += litlen;
      // offset
      uint16_t off = (uint16_t)(ip - ref);
      dst[op++] = (uint8_t)off;
      dst[op++] = (uint8_t)(off >> 8);
      // match length
      int64_t m = mlen - MINMATCH;
      if (m >= 15) {
        *token |= 15;
        m -= 15;
        for (; m >= 255; m -= 255) dst[op++] = 255;
        dst[op++] = (uint8_t)m;
      } else {
        *token |= (uint8_t)m;
      }
      ip += mlen;
      anchor = ip;
    } else {
      ++ip;
    }
  }
  // trailing literals
  int64_t litlen = n - anchor;
  int64_t need = 1 + litlen / 255 + 1 + litlen;
  if (op + need > cap) return -1;
  if (litlen >= 15) {
    dst[op++] = 15 << 4;
    int64_t l = litlen - 15;
    for (; l >= 255; l -= 255) dst[op++] = 255;
    dst[op++] = (uint8_t)l;
  } else {
    dst[op++] = (uint8_t)(litlen << 4);
  }
  std::memcpy(dst + op, src + anchor, litlen);
  op += litlen;
  return op;
}

int64_t dm_lz4_decompress(const uint8_t* src, int64_t n, uint8_t* dst,
                          int64_t cap) {
  int64_t ip = 0, op = 0;
  while (ip < n) {
    uint8_t token = src[ip++];
    int64_t litlen = token >> 4;
    if (litlen == 15) {
      uint8_t b;
      do {
        if (ip >= n) return -1;
        b = src[ip++];
        litlen += b;
      } while (b == 255);
    }
    if (ip + litlen > n || op + litlen > cap) return -1;
    std::memcpy(dst + op, src + ip, litlen);
    ip += litlen;
    op += litlen;
    if (ip >= n) break;  // last sequence: literals only
    if (ip + 2 > n) return -1;
    uint16_t off = (uint16_t)(src[ip] | (src[ip + 1] << 8));
    ip += 2;
    if (off == 0 || off > op) return -1;
    int64_t mlen = (token & 0xF) + MINMATCH;
    if ((token & 0xF) == 15) {
      uint8_t b;
      do {
        if (ip >= n) return -1;
        b = src[ip++];
        mlen += b;
      } while (b == 255);
    }
    if (op + mlen > cap) return -1;
    // overlapping copy must be byte-wise
    const uint8_t* m = dst + op - off;
    for (int64_t k = 0; k < mlen; ++k) dst[op + k] = m[k];
    op += mlen;
  }
  return op;
}

// --------------------------------------------------------- event packing

// Raw ETL slice layout (reference data_znunu/generate_npz.py:131-146):
//   raw[f][e][i], f in 0..11: pt, eta, phi, d0, dz, mass, puppiWeight,
//   pdgId, charge, fromPV, pvRef, pvAssocQuality; -999 fill.
// Output layout (reference model/data_loader.py:70-77):
//   out[e][i][c], c in 0..10: px, py, pt, eta, d0, dz, mass, puppiWeight,
//   pdgId, charge, fromPV;  out_len[e] = surviving candidates.
int dm_pack_events(const float* raw, int64_t nev, int64_t nmax, float clip,
                   float* out, int32_t* out_len) {
  const int64_t plane = nev * nmax;  // stride between raw feature planes
  for (int64_t e = 0; e < nev; ++e) {
    const float* pt = raw + 0 * plane + e * nmax;
    const float* eta = raw + 1 * plane + e * nmax;
    const float* phi = raw + 2 * plane + e * nmax;
    const float* d0 = raw + 3 * plane + e * nmax;
    const float* dz = raw + 4 * plane + e * nmax;
    const float* mass = raw + 5 * plane + e * nmax;
    const float* pup = raw + 6 * plane + e * nmax;
    const float* pdg = raw + 7 * plane + e * nmax;
    const float* chg = raw + 8 * plane + e * nmax;
    const float* fpv = raw + 9 * plane + e * nmax;

    float* dst = out + e * nmax * 11;
    int64_t k = 0;
    for (int64_t i = 0; i < nmax; ++i) {
      if (pdg[i] == -999.0f || chg[i] == -999.0f) continue;  // pad row
      float row[11];
      row[0] = pt[i] * std::cos(phi[i]);
      row[1] = pt[i] * std::sin(phi[i]);
      row[2] = pt[i];
      row[3] = eta[i];
      row[4] = d0[i];
      row[5] = dz[i];
      row[6] = mass[i];
      row[7] = pup[i];
      row[8] = pdg[i];
      row[9] = chg[i];
      row[10] = fpv[i];
      for (int c = 0; c < 11; ++c) {
        float v = row[c];
        if (std::isnan(v)) v = 0.0f;
        else if (std::isinf(v)) v = v > 0 ? clip : -clip;  // nan_to_num
        if (v > clip) v = clip;
        else if (v < -clip) v = -clip;
        dst[k * 11 + c] = v;
      }
      ++k;
    }
    out_len[e] = (int32_t)k;
  }
  return 0;
}

}  // extern "C"
