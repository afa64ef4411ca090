// Monotonic DTW with backtrace, for word-timestamp alignment.
//
// Given a cost matrix x[N, M] (rows = text tokens, cols = audio frames;
// typically the NEGATED averaged cross-attention matrix), finds the
// minimum-cost monotone path from (0,0) to (N-1,M-1) with steps
// diagonal/(down)/(right) and returns it in forward order.
//
// Semantics match openai-whisper's timing.dtw_cpu (dtw over -attention with
// trace values 0=diag, 1=down, 2=right; ties resolve to "right"), which the
// numpy fallback in sar_tpu/decode/align.py mirrors exactly — the two are
// required to produce identical paths (tests/test_align.py).
//
// O(N*M) time, O(N*M) int8 trace + two rolling fp32 cost rows. For the
// Whisper shapes (N <= 448 tokens, M <= 1500 frames) this is < 1 MB and
// ~0.5 ms — negligible next to the decode itself, but 30-50x faster than
// the pure-numpy DP loop, which matters when aligning large batches.

#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// Returns the path length (<= N + M - 1) and fills out_ti/out_tj (forward
// order, each of capacity `cap`), or -1 if cap is too small / empty input.
int64_t dtw_path_f32(const float* x, int64_t n, int64_t m,
                     int32_t* out_ti, int32_t* out_tj, int64_t cap) {
    if (n <= 0 || m <= 0) return -1;
    const float inf = std::numeric_limits<float>::infinity();
    std::vector<int8_t> trace((n + 1) * (m + 1), -1);
    std::vector<float> prev(m + 1, inf), cur(m + 1, inf);
    prev[0] = 0.0f;
    for (int64_t i = 1; i <= n; ++i) {
        cur[0] = inf;
        int8_t* trow = trace.data() + i * (m + 1);
        const float* xrow = x + (i - 1) * m;
        for (int64_t j = 1; j <= m; ++j) {
            float c0 = prev[j - 1];   // diagonal
            float c1 = prev[j];       // down (advance token only)
            float c2 = cur[j - 1];    // right (advance frame only)
            float c;
            int8_t t;
            if (c0 < c1 && c0 < c2) { c = c0; t = 0; }
            else if (c1 < c0 && c1 < c2) { c = c1; t = 1; }
            else { c = c2; t = 2; }
            cur[j] = xrow[j - 1] + c;
            trow[j] = t;
        }
        std::swap(prev, cur);
    }
    // Backtrace (openai's boundary convention: top row forces "right",
    // left column forces "down").
    for (int64_t j = 0; j <= m; ++j) trace[j] = 2;
    for (int64_t i = 0; i <= n; ++i) trace[i * (m + 1)] = 1;
    int64_t i = n, j = m, len = 0;
    std::vector<int32_t> ti, tj;
    ti.reserve(n + m);
    tj.reserve(n + m);
    while (i > 0 || j > 0) {
        ti.push_back(static_cast<int32_t>(i - 1));
        tj.push_back(static_cast<int32_t>(j - 1));
        ++len;
        switch (trace[i * (m + 1) + j]) {
            case 0: --i; --j; break;
            case 1: --i; break;
            default: --j; break;
        }
    }
    if (len > cap) return -1;
    for (int64_t k = 0; k < len; ++k) {   // reverse into forward order
        out_ti[k] = ti[len - 1 - k];
        out_tj[k] = tj[len - 1 - k];
    }
    return len;
}

}  // extern "C"
