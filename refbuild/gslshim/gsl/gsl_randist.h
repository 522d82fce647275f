/* Minimal GSL shim — gsl_randist.h is included by the reference but the
 * live code path (hgaprec_SOURCES) calls nothing from it; gsl_ran_shuffle
 * appears only in dead code (scratch.cc, burstygap.cc). */
#ifndef GSL_SHIM_RANDIST_H
#define GSL_SHIM_RANDIST_H
#include <gsl/gsl_rng.h>
#endif
