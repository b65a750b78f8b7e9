// Native kernels for host-side sequence analysis.
//
// Replaces the reference's external native dependencies (SURVEY §2.3):
//   * parasail (C SIMD Smith-Waterman)  -> sw_align / sw_batch
//   * Levenshtein (C edit distance)     -> levenshtein
//   * dtw-python (C DTW core)           -> dtw_band
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this
// environment).  Scoring matches eval/accuracy.py: match +5, mismatch -4,
// 'N' scores -2 against everything, gap open 8 / extend 4; X/Y are
// first-class bases.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int MATCH = 5;
constexpr int MISMATCH = -4;
constexpr int N_SCORE = -2;
constexpr int GAP_OPEN = 8;
constexpr int GAP_EXTEND = 4;
constexpr int NEG = -100000000;

inline int sub_score(char a, char b) {
    if (a == 'N' || b == 'N') return N_SCORE;
    return a == b ? MATCH : MISMATCH;
}

}  // namespace

extern "C" {

// Edit distance between two byte strings.
int levenshtein(const char* a, int na, const char* b, int nb) {
    if (na < nb) {
        std::swap(a, b);
        std::swap(na, nb);
    }
    std::vector<int> prev(nb + 1), cur(nb + 1);
    for (int j = 0; j <= nb; ++j) prev[j] = j;
    for (int i = 1; i <= na; ++i) {
        cur[0] = i;
        const char ca = a[i - 1];
        for (int j = 1; j <= nb; ++j) {
            const int d = prev[j - 1] + (ca != b[j - 1]);
            cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, d});
        }
        std::swap(prev, cur);
    }
    return prev[nb];
}

// Smith-Waterman with affine gaps and full traceback.
//
// Outputs: bounds[4] = {q0, q1, r0, r1} (exclusive ends), cigar ops written
// into ops_out (chars in "=XID", one per aligned column, max nq+nr), and
// *ops_len.  Returns the best score (0 if no positive-scoring alignment).
int sw_align(const char* q, int nq, const char* r, int nr,
             int* bounds, char* ops_out, int* ops_len) {
    *ops_len = 0;
    bounds[0] = bounds[1] = bounds[2] = bounds[3] = 0;
    if (nq == 0 || nr == 0) return 0;

    std::vector<int> Hprev(nr + 1, 0), Hcur(nr + 1, 0);
    std::vector<int> Frow(nr + 1, NEG);
    // traceback matrices: 2 bits would do; bytes are simpler.
    // tb: 0 stop, 1 diag, 2 up(I), 3 left(D)
    std::vector<uint8_t> TB((size_t)(nq + 1) * (nr + 1), 0);

    int best = 0, bi = 0, bj = 0;
    for (int i = 1; i <= nq; ++i) {
        const char qc = q[i - 1];
        int e = NEG;
        Hcur[0] = 0;
        uint8_t* tbrow = &TB[(size_t)i * (nr + 1)];
        for (int j = 1; j <= nr; ++j) {
            const int f_open = Hprev[j] - GAP_OPEN;
            const int f_ext = Frow[j] - GAP_EXTEND;
            const int f = f_open > f_ext ? f_open : f_ext;
            Frow[j] = f;
            const int e_open = Hcur[j - 1] - GAP_OPEN;
            const int e_ext = e - GAP_EXTEND;
            e = e_open > e_ext ? e_open : e_ext;
            const int diag = Hprev[j - 1] + sub_score(qc, r[j - 1]);
            int h = diag;
            uint8_t t = 1;
            if (e > h) { h = e; t = 3; }
            if (f > h) { h = f; t = 2; }
            if (h <= 0) { h = 0; t = 0; }
            Hcur[j] = h;
            tbrow[j] = t;
            if (h > best) { best = h; bi = i; bj = j; }
        }
        std::swap(Hprev, Hcur);
    }
    if (best == 0) return 0;

    // traceback from (bi, bj)
    int i = bi, j = bj;
    std::vector<char> ops;
    ops.reserve(nq + nr);
    while (i > 0 && j > 0) {
        const uint8_t t = TB[(size_t)i * (nr + 1) + j];
        if (t == 0) break;
        if (t == 1) {
            const bool same = q[i - 1] == r[j - 1] && q[i - 1] != 'N'
                              && r[j - 1] != 'N';
            ops.push_back(same ? '=' : 'X');
            --i; --j;
        } else if (t == 2) {
            ops.push_back('I');
            --i;
        } else {
            ops.push_back('D');
            --j;
        }
    }
    std::reverse(ops.begin(), ops.end());
    bounds[0] = i;
    bounds[1] = bi;
    bounds[2] = j;
    bounds[3] = bj;
    *ops_len = (int)ops.size();
    std::memcpy(ops_out, ops.data(), ops.size());
    return best;
}

// Monotone no-ref-skip DTW (steps: ref stays or advances with each query
// sample); optional slanted band.  Writes per-query ref indices into
// idx_out [T].  Returns 0 on success, -1 if no feasible path.
int dtw_band(const float* query, int T, const float* ref, int R,
             float band, int32_t* idx_out) {
    if (T < R || R == 0) return -1;
    const float BIG = 3.0e38f;
    std::vector<float> D(R, BIG), Dn(R);
    std::vector<uint8_t> diag((size_t)T * R, 0);
    const float slope = (float)R / (float)T;

    auto dist = [&](int i, int j) {
        const float d = query[i] - ref[j];
        return d < 0 ? -d : d;
    };

    int j0 = 0, j1 = R;  // active window [j0, j1)
    D[0] = dist(0, 0);
    for (int i = 1; i < T; ++i) {
        int lo = 0, hi = R;
        if (band > 0) {
            const float c = i * slope;
            lo = std::max(0, (int)(c - band));
            hi = std::min(R, (int)(c + band) + 1);
        }
        uint8_t* drow = &diag[(size_t)i * R];
        float prev_left = lo > 0 ? D[lo - 1] : BIG;
        for (int j = lo; j < hi; ++j) {
            const float stay = D[j];
            const float dg = prev_left;
            prev_left = D[j];  // save before overwrite for next j
            float v;
            if (dg < stay) { v = dg; drow[j] = 1; }
            else { v = stay; drow[j] = 0; }
            Dn[j] = (v >= BIG) ? BIG : v + dist(i, j);
        }
        for (int j = 0; j < lo; ++j) Dn[j] = BIG;
        for (int j = hi; j < R; ++j) Dn[j] = BIG;
        std::swap(D, Dn);
    }
    if (D[R - 1] >= BIG) return -1;

    int j = R - 1;
    for (int i = T - 1; i >= 0; --i) {
        idx_out[i] = j;
        if (i > 0 && diag[(size_t)i * R + j]) --j;
    }
    if (j != 0) return -1;
    return 0;
}

}  // extern "C"
