/* Minimal fftw3f-compatible shim header so the reference csdr builds for
 * golden-test generation without the real FFTW (not available in this image).
 * Implemented in fftw_shim.c with a plain radix-2 FFT in double precision.
 * This is original shim code, not FFTW. */
#pragma once
#include <stdlib.h>

typedef float fftwf_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE (0U)

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags);
fftwf_plan fftwf_plan_dft_r2c_1d(int n, float *in, fftwf_complex *out,
                                 unsigned flags);
fftwf_plan fftwf_plan_dft_c2r_1d(int n, fftwf_complex *in, float *out,
                                 unsigned flags);
void fftwf_execute(fftwf_plan plan);
void fftwf_destroy_plan(fftwf_plan plan);
void *fftwf_malloc(size_t n);
void fftwf_free(void *p);
