/* Minimal GSL shim — special functions used by the reference
 * (gpbase.hh:248-262, 360-387): digamma and log-gamma. */
#ifndef GSL_SHIM_SF_H
#define GSL_SHIM_SF_H

#ifdef __cplusplus
extern "C" {
#endif

double gsl_sf_psi(double x);
double gsl_sf_lngamma(double x);

#ifdef __cplusplus
}
#endif

#endif
