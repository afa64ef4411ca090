// Fast batch Levenshtein distance for corpus WER/CER.
//
// The reference computes WER/CER through HF evaluate/jiwer
// (/root/reference/src/training/metrics.py:15-28) — pure-Python DP.  Here the
// hot loop is native: a cache-friendly two-row DP over int32 token ids
// (words and characters are interned to ids on the Python side), with a
// batch entry point that amortizes the FFI crossing over a whole corpus.
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsar_native.so edit_distance.cpp

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Levenshtein distance between int32 sequences a[0..n) and b[0..m).
int64_t edit_distance_i32(const int32_t* a, int64_t n,
                          const int32_t* b, int64_t m) {
    if (n == 0) return m;
    if (m == 0) return n;
    // Ensure the inner row is the shorter sequence.
    if (m > n) {
        std::swap(a, b);
        std::swap(n, m);
    }
    std::vector<int64_t> row(m + 1);
    for (int64_t j = 0; j <= m; ++j) row[j] = j;
    for (int64_t i = 1; i <= n; ++i) {
        int64_t diag = row[0];           // dp[i-1][0]
        row[0] = i;
        const int32_t ai = a[i - 1];
        for (int64_t j = 1; j <= m; ++j) {
            const int64_t up = row[j];   // dp[i-1][j]
            const int64_t sub = diag + (ai != b[j - 1]);
            const int64_t del = up + 1;
            const int64_t ins = row[j - 1] + 1;
            row[j] = std::min(sub, std::min(del, ins));
            diag = up;
        }
    }
    return row[m];
}

// Batch form: sequences are flattened into a_flat/b_flat with CSR-style
// offsets (n_pairs+1 entries each). out[i] = distance(pair i).
void batch_edit_distance_i32(const int32_t* a_flat, const int64_t* a_off,
                             const int32_t* b_flat, const int64_t* b_off,
                             int64_t n_pairs, int64_t* out) {
    for (int64_t i = 0; i < n_pairs; ++i) {
        out[i] = edit_distance_i32(a_flat + a_off[i], a_off[i + 1] - a_off[i],
                                   b_flat + b_off[i], b_off[i + 1] - b_off[i]);
    }
}

}  // extern "C"
