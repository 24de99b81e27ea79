/* C ABI smoke test: integrate f(x,y) = x*y over the unit square from
 * plain C and require 1e-6 relative accuracy on the exact answer 1/4
 * (the analogue of the reference's C-driver test,
 * test/cuda/pagani/test_integration_from_c.c:1-24).
 *
 * Build: gcc test_from_c.c -o test_from_c -L. -lcpu_quad -lm
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

typedef double (*quad_integrand)(const double* x, int ndim, void* userdata);

extern int quad_cuhre(quad_integrand f, void* userdata, int ndim,
                      const double* lows, const double* highs, double epsrel,
                      double epsabs, long long max_evals,
                      double* out_estimate, double* out_errorest,
                      long long* out_nregions, int* out_status);

static double product_xy(const double* x, int ndim, void* userdata) {
  (void)ndim;
  (void)userdata;
  return x[0] * x[1];
}

int main(void) {
  const double lows[2] = {0.0, 0.0};
  const double highs[2] = {1.0, 1.0};
  double est = 0.0, err = 0.0;
  long long nregions = 0;
  int status = -1;

  int rc = quad_cuhre(product_xy, NULL, 2, lows, highs, 1e-6, 1e-12,
                      10000000LL, &est, &err, &nregions, &status);
  if (rc != 0) {
    fprintf(stderr, "quad_cuhre rc=%d\n", rc);
    return 2;
  }
  const double expected = 0.25;
  const double rel = fabs(est - expected) / expected;
  printf("estimate=%.15e errorest=%.3e nregions=%lld status=%d rel=%.3e\n",
         est, err, nregions, status, rel);
  if (status != 0 || rel > 1e-6) return 1;
  return 0;
}
