// Shared OpenMP thread-count resolution.
//
// omp_set_num_threads is process-global and sticky: an explicit
// num_threads=1 call used to cap every later "default" (num_threads=0)
// call at 1 thread for the life of the process. kDefaultTeam captures the
// library-default team size (OMP_NUM_THREADS or all cores) at load time,
// before any caller can have altered the global, so resolve_threads(0)
// always restores it.

#ifndef GROK_TPU_OMP_UTIL_H_
#define GROK_TPU_OMP_UTIL_H_

#ifdef _OPENMP
#include <omp.h>

namespace ompshared {
static const int kDefaultTeam = omp_get_max_threads();
static inline int resolve_threads(int n) { return n > 0 ? n : kDefaultTeam; }
}  // namespace ompshared
#endif

#endif  // GROK_TPU_OMP_UTIL_H_
