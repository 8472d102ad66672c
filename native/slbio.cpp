// Native IO helpers for slb2d-tpu (built as libslbio.so, loaded via ctypes).
//
// The reference's entire runtime is native C; here only the genuinely hot
// host-side paths are: frame emission (millions of printf-formatted lines
// per movie frame, matching the reference's "%0.5f %0.5f %0.20f" rows,
// reference: src/boltzmann_c_solver.c:341-350) and the float32 loop-trip
// counter used by the exact-time scheduler.
//
// Build: make -C native

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

namespace {

// ---- exact "%0.20f" without printf -----------------------------------
//
// For |v| < 1e15, v*10^20 = m * 5^20 * 2^(e+20) computed exactly in
// unsigned __int128 (53-bit mantissa x 47-bit 5^20 = 100 bits), rounded
// half-to-even on the right shift — the same correctly-rounded digits
// glibc produces under the default FE_TONEAREST mode, at ~20x the speed.
// (printf-grade float formatting is the hot loop of frame emission: a
// movie frame is millions of rows; reference emits them with fprintf,
// src/boltzmann_c_solver.c:341-350.)

const unsigned __int128 POW5_20 = []() {
  unsigned __int128 p = 1;
  for (int i = 0; i < 20; i++) p *= 5;
  return p;
}();
const unsigned __int128 POW10_20 = []() {
  unsigned __int128 p = 1;
  for (int i = 0; i < 20; i++) p *= 10;
  return p;
}();

// 10-digit zero-padded u64 (< 1e10) into out; returns chars written.
inline void put10(uint64_t v, char *out) {
  for (int k = 9; k >= 0; k--) {
    out[k] = char('0' + v % 10);
    v /= 10;
  }
}

// Format v as "%0.20f"; returns chars written (<= 63 always).  Falls
// back to snprintf for huge/non-finite values (never hit by physical
// distribution data); the fallback is TRUNCATED to the 64-byte per-value
// budget — snprintf returns the would-be length, not bytes written, so
// it must be clamped before the caller advances its cursor.
inline int fmt20(double v, char *out) {
  if (!(v > -1e15 && v < 1e15)) {   // also catches NaN
    int n = snprintf(out, 64, "%0.20f", v);
    return n < 0 ? 0 : (n > 63 ? 63 : n);
  }
  char *p = out;
  uint64_t bits;
  memcpy(&bits, &v, 8);
  if (bits >> 63) *p++ = '-';       // incl. -0.0, like printf
  uint64_t mant = bits & ((1ULL << 52) - 1);
  int be = int((bits >> 52) & 0x7ff);
  int e;                            // v = m * 2^e
  uint64_t m;
  if (be) { m = mant | (1ULL << 52); e = be - 1075; }
  else    { m = mant;               e = -1074; }

  unsigned __int128 q = 0;
  if (m) {
    unsigned __int128 P = (unsigned __int128)m * POW5_20;
    int s = e + 20;
    if (s >= 0) {
      q = P << s;                   // |v| < 1e15 keeps this in range
    } else if (s >= -127) {
      unsigned __int128 half = (unsigned __int128)1 << (-s - 1);
      unsigned __int128 rem = P & ((half << 1) - 1);
      q = P >> -s;
      if (rem > half || (rem == half && (q & 1))) q += 1;
    }                               // s < -127: rounds to 0
  }
  uint64_t ip = (uint64_t)(q / POW10_20);
  unsigned __int128 fp = q % POW10_20;
  // integer part (no grouping, no padding)
  char ibuf[24];
  int ilen = 0;
  do { ibuf[ilen++] = char('0' + ip % 10); ip /= 10; } while (ip);
  while (ilen) *p++ = ibuf[--ilen];
  *p++ = '.';
  put10((uint64_t)(fp / 10000000000ULL), p);
  put10((uint64_t)(fp % 10000000000ULL), p + 10);
  p += 20;
  return int(p - out);
}

}  // namespace

extern "C" {

// Append the (phi_x, phi_y, value) triplet rows of one frame to `path`.
// Layout: for each of nx phi_x values, ny rows; F is row-major (nx, ny).
// Row bytes are identical to fprintf("%0.5f %0.5f %0.20f\n", ...).
// Returns 0 on success.
int slb_write_xy_rows(const char *path,
                      const double *phi_x, int nx,
                      const double *phi_y, int ny,
                      const double *F) {
  FILE *fh = fopen(path, "a");
  if (!fh) return 1;
  // coordinate strings repeat every row: format each value once
  std::vector<std::string> pxs(nx), pys(ny);
  char tmp[64];
  for (int i = 0; i < nx; i++) {
    snprintf(tmp, sizeof tmp, "%0.5f ", phi_x[i]);
    pxs[i] = tmp;
  }
  for (int j = 0; j < ny; j++) {
    snprintf(tmp, sizeof tmp, "%0.5f ", phi_y[j]);
    pys[j] = tmp;
  }
  std::vector<char> buf;
  buf.resize((size_t)ny * 64 + 4096);
  for (int i = 0; i < nx; i++) {
    const std::string &px = pxs[i];
    const double *row = F + (int64_t)i * ny;
    char *p = buf.data();
    for (int j = 0; j < ny; j++) {
      memcpy(p, px.data(), px.size());
      p += px.size();
      const std::string &py = pys[j];
      memcpy(p, py.data(), py.size());
      p += py.size();
      p += fmt20(row[j], p);
      *p++ = '\n';
    }
    if (fwrite(buf.data(), 1, p - buf.data(), fh) != (size_t)(p - buf.data())) {
      fclose(fh);
      return 1;
    }
  }
  fclose(fh);
  return 0;
}

// Exposed for equivalence testing against snprintf("%0.20f").
int slb_fmt20(double v, char *out) {
  int n = fmt20(v, out);
  out[n] = 0;
  return n;
}

// Trip count of `for(t = t0; t < t_max; t += dt)` in float32 — the exact
// step count of the reference driver (src/boltzmann_c_solver.c:164).
long long slb_count_steps_f32(float t0, float t_max, float dt) {
  float t = t0;
  long long n = 0;
  while (t < t_max) {
    t += dt;
    n++;
    if (n > (1LL << 40)) break;  // runaway guard
  }
  return n;
}

// Same for float64.
long long slb_count_steps_f64(double t0, double t_max, double dt) {
  double t = t0;
  long long n = 0;
  while (t < t_max) {
    t += dt;
    n++;
    if (n > (1LL << 40)) break;
  }
  return n;
}

}  // extern "C"
