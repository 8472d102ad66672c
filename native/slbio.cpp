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

extern "C" {

// Append the (phi_x, phi_y, value) triplet rows of one frame to `path`.
// Layout: for each of nx phi_x values, ny rows; F is row-major (nx, ny).
// Returns 0 on success.
int slb_write_xy_rows(const char *path,
                      const double *phi_x, int nx,
                      const double *phi_y, int ny,
                      const double *F) {
  FILE *fh = fopen(path, "a");
  if (!fh) return 1;
  static char buf[1 << 20];
  setvbuf(fh, buf, _IOFBF, sizeof(buf));
  for (int i = 0; i < nx; i++) {
    const double px = phi_x[i];
    const double *row = F + (int64_t)i * ny;
    for (int j = 0; j < ny; j++) {
      fprintf(fh, "%0.5f %0.5f %0.20f\n", px, phi_y[j], row[j]);
    }
  }
  fclose(fh);
  return 0;
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
