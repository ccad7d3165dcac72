/* Minimal fftw3f-compatible shim header, just the surface the reference
 * modem's DSP uses (/root/reference/src/fsk.c:73-102,157,552):
 * fftwf_malloc/free, fftwf_plan_many_dft_r2c (rank 1, howmany 1),
 * fftwf_execute, fftwf_destroy_plan.  Implemented in fftw3f_shim.c as a
 * naive O(N^2) real-to-complex DFT — bit-identical results to FFTW are
 * NOT promised (different summation orders), which is why the interop
 * tests compare decoded BYTES, not floats.  Used only to build the
 * reference binary for cross-decode testing; never linked into
 * minimodem_tpu itself. */
#ifndef FFTW3_SHIM_H
#define FFTW3_SHIM_H

#ifdef __cplusplus
extern "C" {
#endif

typedef float fftwf_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;

#define FFTW_ESTIMATE (1U << 6)

void *fftwf_malloc(unsigned long n);
void fftwf_free(void *p);
fftwf_plan fftwf_plan_many_dft_r2c(
    int rank, const int *n, int howmany,
    float *in, const int *inembed, int istride, int idist,
    fftwf_complex *out, const int *onembed, int ostride, int odist,
    unsigned flags);
void fftwf_execute(fftwf_plan plan);
void fftwf_destroy_plan(fftwf_plan plan);

#ifdef __cplusplus
}
#endif
#endif
