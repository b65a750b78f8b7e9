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
#include <unordered_map>
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

// CTC prefix beam search over one read's posteriors [T, C] (class 0 =
// blank) — the fast-ctc-decode equivalent for the legacy CTC family
// (reference: ub-bonito/bonito/ctc/model.py:39-46).  Prefixes live in a
// trie; each node records the frame at which its last base was first
// emitted (same memoisation as the python fallback in ops/ctc.py, which
// defines the semantics).  Writes label codes and frames into
// seq_out/frame_out [max_out]; returns the sequence length, or -1 on
// overflow/bad args.
int ctc_beam_search(const float* probs, int T, int C, int beamsize,
                    float threshold, int32_t* seq_out, int32_t* frame_out,
                    int max_out) {
    if (T <= 0 || C <= 1 || beamsize <= 0) return -1;
    struct Node { int parent; int c; int frame; };
    std::vector<Node> trie;
    trie.push_back({-1, 0, -1});  // root = empty prefix
    // children keyed by (parent << 20) | c  (C < 2^20)
    std::unordered_map<int64_t, int> children;
    auto child = [&](int parent, int c, int t) {
        const int64_t key = ((int64_t)parent << 20) | (int64_t)c;
        auto it = children.find(key);
        if (it != children.end()) return it->second;
        const int id = (int)trie.size();
        trie.push_back({parent, c, t});
        children.emplace(key, id);
        return id;
    };

    struct Beam { int node; double pb, pnb; };
    std::vector<Beam> beams{{0, 1.0, 0.0}};
    std::vector<Beam> nxt;
    std::unordered_map<int, int> slot;  // node -> index in nxt
    auto acc = [&](int node, double pb, double pnb) {
        auto it = slot.find(node);
        if (it == slot.end()) {
            slot.emplace(node, (int)nxt.size());
            nxt.push_back({node, pb, pnb});
        } else {
            nxt[it->second].pb += pb;
            nxt[it->second].pnb += pnb;
        }
    };

    for (int t = 0; t < T; ++t) {
        const float* f = probs + (size_t)t * C;
        nxt.clear();
        slot.clear();
        for (const Beam& b : beams) {
            const double total = b.pb + b.pnb;
            if (f[0] > threshold) acc(b.node, total * f[0], 0.0);
            const int last = trie[b.node].c;  // 0 at root (no base)
            for (int c = 1; c < C; ++c) {
                const double p = f[c];
                if (p <= threshold) continue;
                if (c == last) {
                    acc(b.node, 0.0, b.pnb * p);
                    acc(child(b.node, c, t), 0.0, b.pb * p);
                } else {
                    acc(child(b.node, c, t), 0.0, total * p);
                }
            }
        }
        if (nxt.empty()) nxt.push_back({0, 1.0, 0.0});
        const size_t keep = std::min((size_t)beamsize, nxt.size());
        std::partial_sort(
            nxt.begin(), nxt.begin() + keep, nxt.end(),
            [](const Beam& a, const Beam& b) {
                return a.pb + a.pnb > b.pb + b.pnb;
            });
        nxt.resize(keep);
        std::swap(beams, nxt);
    }

    const Beam* best = &beams[0];
    for (const Beam& b : beams)
        if (b.pb + b.pnb > best->pb + best->pnb) best = &b;
    std::vector<int> rev;
    for (int node = best->node; node != 0; node = trie[node].parent)
        rev.push_back(node);
    if ((int)rev.size() > max_out) return -1;
    const int n = (int)rev.size();
    for (int i = 0; i < n; ++i) {
        const Node& nd = trie[rev[n - 1 - i]];
        seq_out[i] = nd.c;
        frame_out[i] = nd.frame;
    }
    return n;
}

}  // extern "C"
