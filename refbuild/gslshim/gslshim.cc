// GSL shim implementation: MT19937 RNG + digamma + lngamma.
// See gsl/gsl_rng.h for scope.  Original code (not copied from GSL).
#include <gsl/gsl_rng.h>
#include <gsl/gsl_sf.h>

#include <cmath>
#include <random>

struct gsl_rng_s {
  std::mt19937 gen;
};

static const gsl_rng_type mt_type = {"mt19937-shim"};
const gsl_rng_type *gsl_rng_default = &mt_type;

extern "C" {

const gsl_rng_type *gsl_rng_env_setup(void) { return gsl_rng_default; }

gsl_rng *gsl_rng_alloc(const gsl_rng_type *) {
  gsl_rng *r = new gsl_rng_s();
  r->gen.seed(4357u);  // GSL mt19937 default seed
  return r;
}

void gsl_rng_free(gsl_rng *r) { delete r; }

void gsl_rng_set(gsl_rng *r, unsigned long int seed) {
  if (seed == 0) seed = 4357u;  // GSL convention: seed 0 maps to default
  r->gen.seed(static_cast<uint32_t>(seed));
}

double gsl_rng_uniform(gsl_rng *r) {
  // [0, 1) with 32-bit resolution, like GSL's mt19937 get_double.
  return r->gen() * (1.0 / 4294967296.0);
}

unsigned long int gsl_rng_uniform_int(gsl_rng *r, unsigned long int n) {
  // Scaled rejection sampling (GSL semantics: uniform on [0, n-1]).
  unsigned long int range = 4294967295ul;  // mt19937 max
  unsigned long int scale = range / n;
  unsigned long int k;
  do {
    k = r->gen() / scale;
  } while (k >= n);
  return k;
}

// Digamma via upward recurrence to x >= 6, then the asymptotic series
// (Abramowitz & Stegun 6.3.18).  |err| < 1e-12 for x > 0 — more than
// enough next to the reference's own 1e-30 parameter floors.
double gsl_sf_psi(double x) {
  double result = 0.0;
  while (x < 6.0) {
    result -= 1.0 / x;
    x += 1.0;
  }
  const double inv = 1.0 / x;
  const double inv2 = inv * inv;
  result += std::log(x) - 0.5 * inv -
            inv2 * (1.0 / 12.0 -
                    inv2 * (1.0 / 120.0 -
                            inv2 * (1.0 / 252.0 -
                                    inv2 * (1.0 / 240.0 - inv2 / 132.0))));
  return result;
}

double gsl_sf_lngamma(double x) { return std::lgamma(x); }

}  // extern "C"
