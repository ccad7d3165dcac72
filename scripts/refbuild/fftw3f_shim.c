/* Naive r2c DFT backing the fftw3.h shim (see that header).  The
 * reference plans rank-1 howmany-1 transforms with unit strides and
 * executes them on fftsize-point windows of at most a few hundred
 * samples, so O(N^2) with precomputed twiddles is plenty for tests. */
#include <stdlib.h>
#include <math.h>
#include "fftw3.h"

struct fftwf_plan_s {
    int n;
    int nout;
    float *in;
    fftwf_complex *out;
    double *cosw;   /* [nout][n] twiddles */
    double *sinw;
};

void *fftwf_malloc(unsigned long n) { return malloc(n); }
void fftwf_free(void *p) { free(p); }

fftwf_plan fftwf_plan_many_dft_r2c(
    int rank, const int *n, int howmany,
    float *in, const int *inembed, int istride, int idist,
    fftwf_complex *out, const int *onembed, int ostride, int odist,
    unsigned flags)
{
    (void)inembed; (void)onembed; (void)idist; (void)odist; (void)flags;
    if (rank != 1 || howmany != 1 || istride != 1 || ostride != 1)
        return NULL;
    struct fftwf_plan_s *p = malloc(sizeof(*p));
    if (!p)
        return NULL;
    p->n = n[0];
    p->nout = n[0] / 2 + 1;
    p->in = in;
    p->out = out;
    p->cosw = malloc(sizeof(double) * p->nout * p->n);
    p->sinw = malloc(sizeof(double) * p->nout * p->n);
    if (!p->cosw || !p->sinw) {
        free(p->cosw); free(p->sinw); free(p);
        return NULL;
    }
    for (int k = 0; k < p->nout; k++)
        for (int t = 0; t < p->n; t++) {
            double w = 2.0 * M_PI * k * t / p->n;
            p->cosw[k * p->n + t] = cos(w);
            p->sinw[k * p->n + t] = sin(w);
        }
    return p;
}

void fftwf_execute(fftwf_plan p)
{
    for (int k = 0; k < p->nout; k++) {
        double re = 0.0, im = 0.0;
        const double *c = p->cosw + k * p->n;
        const double *s = p->sinw + k * p->n;
        for (int t = 0; t < p->n; t++) {
            re += p->in[t] * c[t];
            im -= p->in[t] * s[t];
        }
        p->out[k][0] = (float)re;
        p->out[k][1] = (float)im;
    }
}

void fftwf_destroy_plan(fftwf_plan p)
{
    if (p) { free(p->cosw); free(p->sinw); free(p); }
}
