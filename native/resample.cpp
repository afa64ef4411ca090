// Polyphase rational resampler (the data-pipeline hot loop).
//
// The reference resamples through torchaudio (C++/SoX under the hood,
// /root/reference/src/data/preprocessing.py:60-66). sar_tpu's numpy
// fallback expresses the same Kaiser-sinc filter as zero-stuff + full
// convolution + decimate — O(N * L * n_taps) work, which at 44.1 kHz ->
// 16 kHz (L=160, M=441, ~28k taps) is ~1000x more multiplies than needed.
// This kernel computes each OUTPUT sample directly from the ~n_taps/L
// filter taps that overlap it (classic polyphase decomposition), matching
// numpy's `convolve(up, taps, mode="same")[::M]` semantics exactly:
//
//   out[m] = L * sum_n in[n] * taps[m*M + half - n*L]
//
// The prototype taps are designed on the Python side (identical Kaiser
// window code), so native and numpy paths share one filter. float64
// accumulation mirrors numpy's convolve dtype. Exposed via a plain C ABI
// for ctypes (no pybind11 dependency).
//
// Build: part of libsar_native.so (see Makefile).

#include <cstdint>

extern "C" {

// in[0..n_in) at rate fs*M/L -> out[0..n_out); n_taps = 2*half+1 (odd).
// Returns the number of output samples written:
//   n_out = (n_in * L + M - 1) / M   (numpy up[::M] length)
int64_t resample_poly_f32(const float* in, int64_t n_in,
                          const double* taps, int64_t n_taps,
                          int32_t L, int32_t M,
                          float* out, int64_t n_out_cap) {
    const int64_t half = (n_taps - 1) / 2;
    const int64_t n_out = (n_in * (int64_t)L + M - 1) / M;
    if (n_out > n_out_cap) return -1;
    for (int64_t m = 0; m < n_out; ++m) {
        const int64_t t = m * (int64_t)M + half;        // center in up-rate
        int64_t n_lo = (t - 2 * half + L - 1) / (int64_t)L;
        if (t - 2 * half < 0) n_lo = 0;                 // C division != floor
        int64_t n_hi = t / (int64_t)L;
        if (n_hi > n_in - 1) n_hi = n_in - 1;
        double acc = 0.0;
        const double* tp = taps + (t - n_lo * (int64_t)L);
        for (int64_t n = n_lo; n <= n_hi; ++n, tp -= L)
            acc += (double)in[n] * *tp;
        out[m] = (float)(acc * L);
    }
    return n_out;
}

}  // extern "C"
