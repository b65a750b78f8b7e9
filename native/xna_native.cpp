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

// Score-only batched Smith-Waterman: best local score of q against each
// of n references (concatenated in refs, ref i at [offsets[i],
// offsets[i+1])).  Two-row DP, no traceback allocation — one native call
// replaces n python->ctypes round trips in exhaustive template scans;
// the caller re-aligns only the argmax with sw_align for the cigar.
void sw_score_batch(const char* q, int nq, const char* refs,
                    const int* offsets, int n, int* scores_out) {
    std::vector<int> Hprev, Hcur, Frow;
    for (int c = 0; c < n; ++c) {
        const char* r = refs + offsets[c];
        const int nr = offsets[c + 1] - offsets[c];
        Hprev.assign(nr + 1, 0);
        Hcur.assign(nr + 1, 0);
        Frow.assign(nr + 1, NEG);
        int best = 0;
        for (int i = 1; i <= nq; ++i) {
            const char qc = q[i - 1];
            int e = NEG;
            Hcur[0] = 0;
            for (int j = 1; j <= nr; ++j) {
                const int f_open = Hprev[j] - GAP_OPEN;
                const int f_ext = Frow[j] - GAP_EXTEND;
                const int f = f_open > f_ext ? f_open : f_ext;
                Frow[j] = f;
                const int e_open = Hcur[j - 1] - GAP_OPEN;
                const int e_ext = e - GAP_EXTEND;
                e = e_open > e_ext ? e_open : e_ext;
                int h = Hprev[j - 1] + sub_score(qc, r[j - 1]);
                if (e > h) h = e;
                if (f > h) h = f;
                if (h <= 0) h = 0;
                Hcur[j] = h;
                if (h > best) best = h;
            }
            std::swap(Hprev, Hcur);
        }
        scores_out[c] = best;
    }
}

// Batched Levenshtein demux: edit distance of q against n candidate
// strings (concatenated in cands, candidate i at [offsets[i], offsets[i+1])),
// with Ukkonen-style early abandon once a row's minimum exceeds the best
// distance so far.  Returns the index of the first minimum; writes the
// best distance into *best_dist.  One native call replaces n
// python->ctypes round-trips in the construct aligner's insert demux.
int lev_demux(const char* q, int nq, const char* cands,
              const int* offsets, int n, int* best_dist) {
    int best = 1 << 30, best_i = -1;
    std::vector<int> prev(nq + 1), cur(nq + 1);
    for (int c = 0; c < n; ++c) {
        const char* b = cands + offsets[c];
        const int nb = offsets[c + 1] - offsets[c];
        const int lo_bound = nb > nq ? nb - nq : nq - nb;
        if (lo_bound >= best) continue;
        for (int j = 0; j <= nq; ++j) prev[j] = j;
        int row_min = 0;
        int i = 1;
        for (; i <= nb; ++i) {
            cur[0] = i;
            row_min = i;
            const char cb = b[i - 1];
            for (int j = 1; j <= nq; ++j) {
                const int d = prev[j - 1] + (cb != q[j - 1]);
                int v = prev[j] + 1;
                const int l = cur[j - 1] + 1;
                if (l < v) v = l;
                if (d < v) v = d;
                cur[j] = v;
                if (v < row_min) row_min = v;
            }
            if (row_min >= best) break;  // cannot improve
            std::swap(prev, cur);
        }
        if (i > nb && prev[nq] < best) {
            best = prev[nq];
            best_i = c;
        }
    }
    if (best_dist) *best_dist = best;
    return best_i;
}

// Banded Smith-Waterman: same scoring/traceback as sw_align but the DP is
// restricted to diagonals d = j - i in [dlo, dhi] (0-based, i over query,
// j over reference).  For a read whose locus is known from a seed scan the
// band turns the O(nq*nr) full matrix into O(nq*band) — the
// locate-then-extend shape of minimap2's alignment stage.  Callers must
// treat a weak banded score as "band missed" and fall back to sw_align.
int sw_align_banded(const char* q, int nq, const char* r, int nr,
                    int dlo, int dhi,
                    int* bounds, char* ops_out, int* ops_len) {
    *ops_len = 0;
    bounds[0] = bounds[1] = bounds[2] = bounds[3] = 0;
    if (nq == 0 || nr == 0 || dhi < dlo) return 0;
    const int bw = dhi - dlo + 1;

    // H/F carried per band offset; offset of (i, j) is j - i - dlo, which
    // is INVARIANT along a diagonal: diag neighbour (i-1, j-1) sits at the
    // same offset in the previous row, (i-1, j) at offset+1, (i, j-1) at
    // offset-1.
    std::vector<int> Hprev(bw, 0), Hcur(bw, NEG);
    std::vector<int> Fprev(bw, NEG), Fcur(bw, NEG);
    std::vector<uint8_t> TB((size_t)(nq + 1) * bw, 0);

    int best = 0, bi = 0, bj = 0;
    // virtual row 0: H = 0 everywhere (handled via the i-1==0 case below)
    for (int i = 1; i <= nq; ++i) {
        const char qc = q[i - 1];
        const int jlo = std::max(1, i + dlo);
        const int jhi = std::min(nr, i + dhi);
        std::fill(Hcur.begin(), Hcur.end(), NEG);
        std::fill(Fcur.begin(), Fcur.end(), NEG);
        uint8_t* tbrow = &TB[(size_t)i * bw];
        int e = NEG;
        for (int j = jlo; j <= jhi; ++j) {
            const int off = j - i - dlo;
            const int hup = (off + 1 < bw) ? Hprev[off + 1] : NEG;
            const int fup = (off + 1 < bw) ? Fprev[off + 1] : NEG;
            const int f_open = (i - 1 == 0) ? -GAP_OPEN : hup - GAP_OPEN;
            const int f_ext = fup - GAP_EXTEND;
            const int f = f_open > f_ext ? f_open : f_ext;
            Fcur[off] = f;
            const int hleft = (off - 1 >= 0 && j - 1 >= jlo)
                                  ? Hcur[off - 1] : NEG;
            const int e_open = (j - 1 == 0) ? -GAP_OPEN : hleft - GAP_OPEN;
            const int e_ext = e - GAP_EXTEND;
            e = e_open > e_ext ? e_open : e_ext;
            const int hdiag = (i - 1 == 0 || j - 1 == 0) ? 0 : Hprev[off];
            const int diag = hdiag + sub_score(qc, r[j - 1]);
            int h = diag;
            uint8_t t = 1;
            if (e > h) { h = e; t = 3; }
            if (f > h) { h = f; t = 2; }
            if (h <= 0) { h = 0; t = 0; }
            Hcur[off] = h;
            tbrow[off] = t;
            if (h > best) { best = h; bi = i; bj = j; }
        }
        std::swap(Hprev, Hcur);
        std::swap(Fprev, Fcur);
    }
    if (best == 0) return 0;

    int i = bi, j = bj;
    std::vector<char> ops;
    ops.reserve(nq + nr);
    while (i > 0 && j > 0) {
        const int off = j - i - dlo;
        if (off < 0 || off >= bw) break;
        const uint8_t t = TB[(size_t)i * bw + off];
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

// Partial-order-alignment consensus (the reference's spoa / CudaPoaBatch
// path, ub-bonito/bonito/util.py:440-465 and cli/duplex.py:43-97).
//
// Graph POA with per-sequence global alignment (Needleman-Wunsch against
// the DAG, linear gaps, spoa-like scores 5/-4/-8), node fusion via
// aligned-variant sets, and heaviest-bundle consensus (max-weight path
// over edge traversal counts).  Groups here are small (reads of a few
// hundred bases, tens of copies), so the O(V * L) DP per sequence is fast.
//
// C ABI: sequences arrive as one concatenated byte buffer + lengths.
// Returns the consensus length written to `out`, or -1 on overflow.
int poa_consensus(const char* seqs, const int* lens, int n_seqs,
                  char* out, int out_cap) {
    if (n_seqs <= 0) return 0;

    struct PNode {
        char base;
        std::vector<int> pred, pred_w;  // parallel arrays
        std::vector<int> aln;           // variant nodes in the same column
    };
    std::vector<PNode> g;
    g.reserve(lens[0] * 2);

    // seed the graph with the first sequence as a chain
    const char* s0 = seqs;
    for (int i = 0; i < lens[0]; ++i) {
        PNode n;
        n.base = s0[i];
        if (i > 0) {
            n.pred.push_back((int)g.size() - 1);
            n.pred_w.push_back(1);
        }
        g.push_back(std::move(n));
    }

    constexpr int PM = 5, PX = -4, PG = -8;
    const char* sp = seqs + lens[0];

    for (int si = 1; si < n_seqs; ++si) {
        const char* s = sp;
        const int L = lens[si];
        sp += L;
        if (L == 0) continue;
        const int V = (int)g.size();
        if (V == 0) {
            for (int i = 0; i < L; ++i) {
                PNode n;
                n.base = s[i];
                if (i > 0) {
                    n.pred.push_back((int)g.size() - 1);
                    n.pred_w.push_back(1);
                }
                g.push_back(std::move(n));
            }
            continue;
        }
        // fusion can create edges from later-created variant nodes into
        // earlier nodes, so id order is NOT topological after the first
        // merge — compute a topo order (Kahn) for the DP sweep.
        std::vector<int> order, rank(V + 1, 0);
        order.reserve(V);
        {
            std::vector<std::vector<int>> succ(V);
            std::vector<int> in_deg(V, 0);
            for (int u = 0; u < V; ++u)
                for (int p : g[u].pred) {
                    succ[p].push_back(u);
                    ++in_deg[u];
                }
            for (int u = 0; u < V; ++u)
                if (in_deg[u] == 0) order.push_back(u);
            for (size_t h = 0; h < order.size(); ++h)
                for (int w : succ[order[h]])
                    if (--in_deg[w] == 0) order.push_back(w);
        }
        for (int r = 0; r < V; ++r) rank[order[r]] = r + 1;
        // DP over (node rank 1..V, seq pos 0..L); rank 0 = virtual source.
        const int W = L + 1;
        std::vector<int> H((V + 1) * W);
        // trace: 0 = diag from pred p, 1 = up (graph gap) from pred p,
        // 2 = left (seq gap); pred id packed alongside.
        std::vector<int8_t> tb((V + 1) * W);
        std::vector<int> tp((V + 1) * W, -1);
        for (int j = 0; j <= L; ++j) H[j] = j * PG;
        for (int r = 1; r <= V; ++r) {
            const PNode& nd = g[order[r - 1]];
            const int row = r * W;
            const int n_pred = (int)nd.pred.size();
            for (int j = 0; j <= L; ++j) {
                int best = NEG, bt = 2, bp = -1;
                if (j > 0) {  // seq gap (consume seq char, stay)
                    best = H[row + j - 1] + PG;
                    bt = 2;
                }
                const int m = (j > 0)
                    ? ((nd.base == s[j - 1]) ? PM : PX) : 0;
                if (n_pred == 0) {
                    const int prow = 0;  // virtual source row
                    if (j > 0 && H[prow + j - 1] + m > best) {
                        best = H[prow + j - 1] + m; bt = 0; bp = -1;
                    }
                    if (H[prow + j] + PG > best) {
                        best = H[prow + j] + PG; bt = 1; bp = -1;
                    }
                } else {
                    for (int pi = 0; pi < n_pred; ++pi) {
                        const int prow = rank[nd.pred[pi]] * W;
                        if (j > 0 && H[prow + j - 1] + m > best) {
                            best = H[prow + j - 1] + m;
                            bt = 0; bp = nd.pred[pi];
                        }
                        if (H[prow + j] + PG > best) {
                            best = H[prow + j] + PG;
                            bt = 1; bp = nd.pred[pi];
                        }
                    }
                }
                H[row + j] = best;
                tb[row + j] = (int8_t)bt;
                tp[row + j] = bp;
            }
        }
        // global end: best over all sink rows at j == L (any node may end
        // the alignment; unvisited suffix nodes cost nothing, matching
        // spoa's semi-global "align to a path" semantics).
        int ev = 0, escore = NEG;
        for (int r = 1; r <= V; ++r)
            if (H[r * W + L] > escore) { escore = H[r * W + L]; ev = r; }
        // backtrack into (node, seqpos) pairs; r is a rank, order[r-1] the id
        std::vector<std::pair<int, int>> walk;  // (node id or -1, pos or -1)
        int r = ev, j = L;
        while (j > 0 || r > 0) {
            const int row = r * W;
            const int8_t t = tb[row + j];
            if (r == 0) {  // only seq-gap moves remain
                walk.push_back({-1, j - 1});
                --j;
                continue;
            }
            if (t == 0) {
                walk.push_back({order[r - 1], j - 1});
                const int p = tp[row + j];
                r = p < 0 ? 0 : rank[p];
                --j;
            } else if (t == 1) {
                walk.push_back({order[r - 1], -1});
                const int p = tp[row + j];
                r = p < 0 ? 0 : rank[p];
            } else {
                walk.push_back({-1, j - 1});
                --j;
            }
        }
        std::reverse(walk.begin(), walk.end());
        // merge the aligned sequence into the graph
        int prev = -1;
        for (const auto& [node, pos] : walk) {
            if (pos < 0) continue;  // node skipped by this sequence
            const char base = s[pos];
            int cur = -1;
            if (node >= 0 && g[node].base == base) {
                cur = node;
            } else if (node >= 0) {
                for (int a : g[node].aln)
                    if (g[a].base == base) { cur = a; break; }
            }
            if (cur < 0) {
                PNode n;
                n.base = base;
                cur = (int)g.size();
                if (node >= 0) {
                    n.aln = g[node].aln;
                    n.aln.push_back(node);
                    for (int a : n.aln) g[a].aln.push_back(cur);
                }
                g.push_back(std::move(n));
            }
            if (prev >= 0 && prev != cur) {
                bool found = false;
                for (size_t pi = 0; pi < g[cur].pred.size(); ++pi)
                    if (g[cur].pred[pi] == prev) {
                        ++g[cur].pred_w[pi];
                        found = true;
                        break;
                    }
                if (!found) {
                    g[cur].pred.push_back(prev);
                    g[cur].pred_w.push_back(1);
                }
            }
            prev = cur;
        }
    }

    // Heaviest-bundle consensus: nodes were appended in topological order
    // EXCEPT fused edges may point from high to low ids (a later-created
    // variant node can precede an earlier node).  Compute a real topo
    // order first (Kahn over pred lists).
    const int V = (int)g.size();
    std::vector<int> order;
    order.reserve(V);
    {
        std::vector<std::vector<int>> succ(V);
        std::vector<int> in_deg(V, 0);
        for (int v = 0; v < V; ++v)
            for (int p : g[v].pred) {
                succ[p].push_back(v);
                ++in_deg[v];
            }
        std::vector<int> q;
        for (int v = 0; v < V; ++v)
            if (in_deg[v] == 0) q.push_back(v);
        for (size_t h = 0; h < q.size(); ++h) {
            const int v = q[h];
            order.push_back(v);
            for (int w : succ[v])
                if (--in_deg[w] == 0) q.push_back(w);
        }
        if ((int)order.size() != V) return -1;  // cycle: cannot happen
    }
    std::vector<long> score(V, 0);
    std::vector<int> from(V, -1);
    long best = -1;
    int bestv = -1;
    for (int v : order) {
        for (size_t pi = 0; pi < g[v].pred.size(); ++pi) {
            const long cand = score[g[v].pred[pi]] + g[v].pred_w[pi];
            if (cand > score[v]) {
                score[v] = cand;
                from[v] = g[v].pred[pi];
            }
        }
        if (score[v] > best) { best = score[v]; bestv = v; }
    }
    std::vector<char> cons;
    for (int v = bestv; v >= 0; v = from[v]) cons.push_back(g[v].base);
    if ((int)cons.size() > out_cap) return -1;
    std::reverse(cons.begin(), cons.end());
    std::memcpy(out, cons.data(), cons.size());
    return (int)cons.size();
}

// Global Needleman-Wunsch with linear gap cost and full traceback,
// emitting aligned index-pair columns in the reference duplex envelope's
// form (cli/duplex.py:143-148: cumsum-of-consumed-chars minus one, so a
// gap column repeats the previous index; -1 before the first char).
// The reference calls parasail nw_trace_striped_32(open=2, extend=2,
// dnafull); with open == extend the affine cost degenerates to a linear
// 2/base gap, so a linear-gap DP reproduces that scoring exactly.
// Returns the number of columns written, or -1 if (na+1)*(nb+1) cells
// exceed max_cells (caller falls back / shrinks).
int nw_trace(const char* a, int na, const char* b, int nb,
             int match, int mismatch, int gap,
             int32_t* pairs_out, int max_cols, long long max_cells) {
    const long long cells = (long long)(na + 1) * (nb + 1);
    if (cells > max_cells || na + nb > max_cols) return -1;
    std::vector<int32_t> prev(nb + 1), cur(nb + 1);
    std::vector<uint8_t> tb((size_t)cells);  // 0=diag 1=up(a-gap? no: consume a) 2=left
    for (int j = 0; j <= nb; ++j) {
        prev[j] = -gap * j;
        tb[j] = 2;
    }
    for (int i = 1; i <= na; ++i) {
        cur[0] = -gap * i;
        uint8_t* tbr = tb.data() + (size_t)i * (nb + 1);
        tbr[0] = 1;
        const char ai = a[i - 1];
        for (int j = 1; j <= nb; ++j) {
            const char bj = b[j - 1];
            // honor the caller's match/mismatch (the numpy oracle
            // nw_trace_np does; diverging here would silently change
            // scores between the native and fallback paths)
            const int sub = (ai == 'N' || bj == 'N') ? N_SCORE
                            : (ai == bj ? match : mismatch);
            const int diag = prev[j - 1] + sub;
            const int up = prev[j] - gap;     // consume a[i-1], gap in b
            const int left = cur[j - 1] - gap;  // consume b[j-1], gap in a
            int best = diag;
            uint8_t mv = 0;
            if (up > best) { best = up; mv = 1; }
            if (left > best) { best = left; mv = 2; }
            cur[j] = best;
            tbr[j] = mv;
        }
        std::swap(prev, cur);
    }
    // traceback from (na, nb): collect moves in reverse, then replay
    // forward emitting consumed-count-minus-one index pairs
    std::vector<uint8_t> moves;
    moves.reserve(na + nb);
    int i = na, j = nb;
    while (i > 0 || j > 0) {
        const uint8_t mv = tb[(size_t)i * (nb + 1) + j];
        moves.push_back(mv);
        if (mv == 0) { --i; --j; }
        else if (mv == 1) { --i; }
        else { --j; }
    }
    const int n_cols = (int)moves.size();
    int ca = 0, cb = 0;
    for (int k = 0; k < n_cols; ++k) {
        const uint8_t mv = moves[n_cols - 1 - k];
        if (mv == 0) { ++ca; ++cb; }
        else if (mv == 1) { ++ca; }
        else { ++cb; }
        pairs_out[2 * k] = ca - 1;
        pairs_out[2 * k + 1] = cb - 1;
    }
    return n_cols;
}

// Envelope-banded exact pair Viterbi over two CRF transition-posterior
// tensors (the TPU-native replacement for fast-ctc-decode's
// crf_beam_search_duplex, reference cli/duplex.py:257-268).  Rather than
// an approximate beam, this is the exact joint decode: find the single
// base sequence S maximising
//   log P1(label path emitting S | strand1) + log P2(... | strand2)
// by DP over cells (i frames of strand1 consumed, j frames of strand2
// consumed, CRF state s), with j confined to the alignment envelope of
// strand1 frame i.  Moves: blank in strand1 (i-1,j,s); blank in strand2
// (i,j-1,s); synchronised emission of base b = s % nb from old state
// o = d*(ns/nb) + s/nb (both strands emit b, scores multiplied).
//
// logt* are [T][ns][nb+1] natural-log transition posteriors in the
// (old_state, {stay, emit b}) layout of compute_transition_probs
// (crf/model.py:63-76); logi* are [ns] log initial-state posteriors.
// env is [T1][2] inclusive-lo / exclusive-hi strand2 windows per strand1
// frame (build_envelope, cli/duplex.py:138-181).  Returns the emitted
// length (seq codes 1..nb into seq_out, strand1 emission frames into
// frames_out) or -1 when the DP would exceed max_cells.
int pair_viterbi(const float* logt1, const float* logi1, int T1,
                 const float* logt2, const float* logi2, int T2,
                 const int32_t* env, int ns, int nb,
                 int32_t* seq_out, int32_t* frames_out, int max_out,
                 long long max_cells) {
    const int nk = nb + 1;
    const int nsd = ns / nb;
    const double NEGINF = -1e30;
    // per-row windows [lo_i, hi_i] inclusive over j in 0..T2
    std::vector<int> lo(T1 + 1), hi(T1 + 1);
    lo[0] = 0;
    hi[0] = env ? std::min<int>(env[1], T2) : T2;
    for (int i = 1; i <= T1; ++i) {
        lo[i] = env ? std::max(0, env[2 * (i - 1)]) : 0;
        hi[i] = env ? std::min<int>(env[2 * (i - 1) + 1], T2) : T2;
        if (lo[i] > hi[i]) lo[i] = hi[i];
    }
    hi[T1] = T2;  // full consumption of strand2
    if (lo[T1] > T2) lo[T1] = T2;
    int wmax = 0;
    for (int i = 0; i <= T1; ++i) wmax = std::max(wmax, hi[i] - lo[i] + 1);
    const long long cells = (long long)(T1 + 1) * wmax * ns;
    if (cells > max_cells) return -1;

    std::vector<double> dp_prev((size_t)wmax * ns, NEGINF);
    std::vector<double> dp_cur((size_t)wmax * ns, NEGINF);
    std::vector<uint8_t> tb((size_t)(T1 + 1) * wmax * ns);

    // row 0: strand2 blanks only
    for (int j = lo[0]; j <= hi[0]; ++j) {
        double* cell = dp_prev.data() + (size_t)(j - lo[0]) * ns;
        uint8_t* tc = tb.data() + (size_t)(j - lo[0]) * ns;
        if (j == 0) {
            for (int s = 0; s < ns; ++s) cell[s] = logi1[s] + logi2[s];
        } else {
            const double* pc = dp_prev.data() + (size_t)(j - 1 - lo[0]) * ns;
            const float* t2 = logt2 + (size_t)(j - 1) * ns * nk;
            for (int s = 0; s < ns; ++s) {
                cell[s] = pc[s] + t2[(size_t)s * nk];
                tc[s] = 1;
            }
        }
    }

    for (int i = 1; i <= T1; ++i) {
        std::fill(dp_cur.begin(), dp_cur.end(), NEGINF);
        const float* t1 = logt1 + (size_t)(i - 1) * ns * nk;
        uint8_t* tbrow = tb.data() + (size_t)i * wmax * ns;
        for (int j = lo[i]; j <= hi[i]; ++j) {
            double* cell = dp_cur.data() + (size_t)(j - lo[i]) * ns;
            uint8_t* tc = tbrow + (size_t)(j - lo[i]) * ns;
            const bool in_prev = j >= lo[i - 1] && j <= hi[i - 1];
            const double* up = in_prev
                ? dp_prev.data() + (size_t)(j - lo[i - 1]) * ns : nullptr;
            const bool in_prev_d = j - 1 >= lo[i - 1] && j - 1 <= hi[i - 1];
            const double* dg = in_prev_d
                ? dp_prev.data() + (size_t)(j - 1 - lo[i - 1]) * ns : nullptr;
            const bool in_cur_l = j - 1 >= lo[i];
            const double* lf = in_cur_l
                ? dp_cur.data() + (size_t)(j - 1 - lo[i]) * ns : nullptr;
            const float* t2 = j >= 1
                ? logt2 + (size_t)(j - 1) * ns * nk : nullptr;
            for (int s = 0; s < ns; ++s) {
                double best = NEGINF;
                uint8_t mv = 255;
                if (up) {  // blank in strand1
                    best = up[s] + t1[(size_t)s * nk];
                    mv = 0;
                }
                if (lf && t2) {  // blank in strand2
                    const double v = lf[s] + t2[(size_t)s * nk];
                    if (v > best) { best = v; mv = 1; }
                }
                if (dg && t2) {  // synchronised emission
                    const int b = s % nb;
                    const int base_o = s / nb;
                    for (int d = 0; d < nb; ++d) {
                        const int o = d * nsd + base_o;
                        const double v = dg[o]
                            + t1[(size_t)o * nk + 1 + b]
                            + t2[(size_t)o * nk + 1 + b];
                        if (v > best) { best = v; mv = (uint8_t)(2 + d); }
                    }
                }
                cell[s] = best;
                tc[s] = mv;
            }
        }
        std::swap(dp_prev, dp_cur);
    }

    // best final state at (T1, T2)
    const double* fin = dp_prev.data() + (size_t)(T2 - lo[T1]) * ns;
    int s = 0;
    for (int k = 1; k < ns; ++k) if (fin[k] > fin[s]) s = k;
    if (fin[s] <= NEGINF / 2) return 0;

    // traceback
    std::vector<int32_t> codes, frames;
    int i = T1, j = T2;
    while (i > 0 || j > 0) {
        const uint8_t mv =
            tb[(size_t)i * wmax * ns + (size_t)(j - lo[i]) * ns + s];
        if (mv == 0) { --i; }
        else if (mv == 1) { --j; }
        else if (mv == 255) { break; }  // start cell (row-0 j==0)
        else {
            const int b = s % nb;
            codes.push_back(b + 1);
            frames.push_back(i - 1);
            s = (mv - 2) * nsd + s / nb;
            --i; --j;
        }
    }
    const int n = (int)codes.size();
    if (n > max_out) return -1;
    for (int k = 0; k < n; ++k) {
        seq_out[k] = codes[n - 1 - k];
        frames_out[k] = frames[n - 1 - k];
    }
    return n;
}

}  // extern "C"
