#ifndef GSL_SHIM_SF_PSI_H
#define GSL_SHIM_SF_PSI_H
#include <gsl/gsl_sf.h>
#endif
