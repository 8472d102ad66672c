/* Minimal GSL special-function shim so the reference C solver can be
 * compiled as a test oracle on a machine without GSL installed.
 *
 * Implements only what the reference uses: modified Bessel functions of
 * the first kind, integer order (gsl_sf_bessel_In, gsl_sf_bessel_I0).
 * Power-series evaluation in double precision, accurate to ~1e-15 rel —
 * far below the solver's float32 storage resolution.  Original code; not
 * derived from GSL.
 */
#ifndef GSL_SPECFUNC_SHIM_H
#define GSL_SPECFUNC_SHIM_H

#include <math.h>

static double gsl_sf_bessel_In(const int n, const double x) {
  if (x == 0.0) return n == 0 ? 1.0 : 0.0;
  const double ax = fabs(x);
  /* t_0 = (x/2)^n / n! via logs to avoid overflow */
  double t = exp(n * log(ax / 2.0) - lgamma((double)n + 1.0));
  const double q = ax * ax / 4.0;
  double sum = t;
  for (int k = 1; k < 100000; k++) {
    t *= q / ((double)k * (double)(n + k));
    const double next = sum + t;
    if (next == sum) break;
    sum = next;
  }
  /* I_n(-x) = (-1)^n I_n(x) for integer n */
  if (x < 0 && (n & 1)) return -sum;
  return sum;
}

static double gsl_sf_bessel_I0(const double x) {
  return gsl_sf_bessel_In(0, x);
}

#endif
