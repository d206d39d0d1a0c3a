// Fail-fast error macros: the C++ error-handling component
// (reference: Documentation/CppReference/ccv_nnc_mfa_error.hpp:16-24 —
// CCV_NNC_MFA_CHECK_ERROR / CCV_NNC_MFA_PRECONDITION with file/line).
#pragma once

#include <cstdio>
#include <cstdlib>

#define MFA_LOG_HEADER "\x1b[1;36m[mfa_tpu]\x1b[0m "

#define MFA_PRECONDITION(cond)                                              \
  do {                                                                      \
    if (!(cond)) {                                                          \
      std::fprintf(stderr,                                                  \
                   MFA_LOG_HEADER "precondition failed: %s (%s:%d)\n",      \
                   #cond, __FILE__, __LINE__);                              \
      std::abort();                                                         \
    }                                                                       \
  } while (0)

#define MFA_CHECK(cond, msg)                                                \
  do {                                                                      \
    if (!(cond)) {                                                          \
      std::fprintf(stderr, MFA_LOG_HEADER "error: %s (%s:%d)\n", msg,       \
                   __FILE__, __LINE__);                                     \
      std::abort();                                                         \
    }                                                                       \
  } while (0)
