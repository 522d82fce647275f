/* Minimal GSL shim — RNG surface.
 *
 * Just enough of the GNU Scientific Library API to compile and run the
 * reference hgaprec binary for parity benchmarking (GSL itself is not
 * installed on this host).  The live reference code uses only:
 *   gsl_rng_env_setup, gsl_rng_default, gsl_rng_alloc, gsl_rng_set,
 *   gsl_rng_uniform, gsl_rng_uniform_int        (hgaprec.cc:34-37, 1718;
 *                                                gpbase.hh:292-340)
 * Backed by MT19937 (same generator family as GSL's default), so the
 * reference's distributional behavior is preserved; bitwise RNG parity is
 * not required by the acceptance criteria (run-to-run variance).
 */
#ifndef GSL_SHIM_RNG_H
#define GSL_SHIM_RNG_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct gsl_rng_type_s {
  const char *name;
} gsl_rng_type;

typedef struct gsl_rng_s gsl_rng;

extern const gsl_rng_type *gsl_rng_default;

const gsl_rng_type *gsl_rng_env_setup(void);
gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_free(gsl_rng *r);
void gsl_rng_set(gsl_rng *r, unsigned long int seed);
double gsl_rng_uniform(gsl_rng *r);
unsigned long int gsl_rng_uniform_int(gsl_rng *r, unsigned long int n);

#ifdef __cplusplus
}
#endif

#endif
