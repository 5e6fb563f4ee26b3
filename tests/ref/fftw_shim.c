/* Minimal FFT backend with an fftw3f-compatible API, used ONLY to build the
 * reference csdr for golden-test generation (no FFTW in this image).
 * Plain iterative radix-2 Cooley-Tukey in double precision; unnormalized,
 * sign conventions matching FFTW (FORWARD = e^{-i2pi/n}). Pow2 sizes only,
 * which covers every FFT size csdr uses (all are next_pow2 results). */
#include "fftw3.h"
#include <math.h>
#include <string.h>

struct fftwf_plan_s {
  int n;
  int kind; /* 0=c2c, 1=r2c, 2=c2r */
  int sign;
  float *in;
  float *out; /* interleaved for complex */
  double *wr, *wi, *br, *bi;
};

static void fft_inplace(double *re, double *im, int n, int sign) {
  /* bit reversal */
  for (int i = 1, j = 0; i < n; i++) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      double t = re[i]; re[i] = re[j]; re[j] = t;
      t = im[i]; im[i] = im[j]; im[j] = t;
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = sign * 2.0 * M_PI / len;
    double wlr = cos(ang), wli = sin(ang);
    for (int i = 0; i < n; i += len) {
      double wr = 1.0, wi = 0.0;
      for (int k = 0; k < len / 2; k++) {
        double ur = re[i + k], ui = im[i + k];
        double vr = re[i + k + len / 2] * wr - im[i + k + len / 2] * wi;
        double vi = re[i + k + len / 2] * wi + im[i + k + len / 2] * wr;
        re[i + k] = ur + vr; im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr; im[i + k + len / 2] = ui - vi;
        double nwr = wr * wlr - wi * wli;
        wi = wr * wli + wi * wlr; wr = nwr;
      }
    }
  }
}

static fftwf_plan mkplan(int n, int kind, int sign, float *in, float *out) {
  fftwf_plan p = (fftwf_plan)malloc(sizeof(struct fftwf_plan_s));
  p->n = n; p->kind = kind; p->sign = sign; p->in = in; p->out = out;
  p->wr = (double *)malloc(sizeof(double) * n);
  p->wi = (double *)malloc(sizeof(double) * n);
  p->br = NULL; p->bi = NULL;
  return p;
}

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags) {
  (void)flags;
  return mkplan(n, 0, sign, (float *)in, (float *)out);
}

fftwf_plan fftwf_plan_dft_r2c_1d(int n, float *in, fftwf_complex *out,
                                 unsigned flags) {
  (void)flags;
  return mkplan(n, 1, FFTW_FORWARD, in, (float *)out);
}

fftwf_plan fftwf_plan_dft_c2r_1d(int n, fftwf_complex *in, float *out,
                                 unsigned flags) {
  (void)flags;
  return mkplan(n, 2, FFTW_BACKWARD, (float *)in, out);
}

void fftwf_execute(fftwf_plan p) {
  int n = p->n;
  if (p->kind == 0) {
    for (int i = 0; i < n; i++) { p->wr[i] = p->in[2 * i]; p->wi[i] = p->in[2 * i + 1]; }
    fft_inplace(p->wr, p->wi, n, p->sign);
    for (int i = 0; i < n; i++) { p->out[2 * i] = (float)p->wr[i]; p->out[2 * i + 1] = (float)p->wi[i]; }
  } else if (p->kind == 1) {
    for (int i = 0; i < n; i++) { p->wr[i] = p->in[i]; p->wi[i] = 0.0; }
    fft_inplace(p->wr, p->wi, n, FFTW_FORWARD);
    for (int i = 0; i <= n / 2; i++) { p->out[2 * i] = (float)p->wr[i]; p->out[2 * i + 1] = (float)p->wi[i]; }
  } else {
    /* c2r: hermitian input of n/2+1 bins */
    for (int i = 0; i <= n / 2; i++) { p->wr[i] = p->in[2 * i]; p->wi[i] = p->in[2 * i + 1]; }
    for (int i = n / 2 + 1; i < n; i++) { p->wr[i] = p->wr[n - i]; p->wi[i] = -p->wi[n - i]; }
    fft_inplace(p->wr, p->wi, n, FFTW_BACKWARD);
    for (int i = 0; i < n; i++) p->out[i] = (float)p->wr[i];
  }
}

void fftwf_destroy_plan(fftwf_plan p) {
  free(p->wr); free(p->wi); free(p);
}

void *fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void *p) { free(p); }
