// Native gap-fill traversal engine: bounded breadth-first contig
// construction in the DBG (the IterativeExtensions + BranchingTerminator
// equivalent; reference src/Filler.cpp:866-884 — behavior reconstructed and
// calibrated in mindthegap_tpu/fill/traversal.py; this file is a scalar C++
// port of THAT python engine, bit-exact, for the fill hot loop #3 of
// SURVEY.md §3).
//
// The membership structure is the fused cuckoo quotient map built by
// mindthegap_tpu/ops/extmap.py build_fused: one u64 slot probe per
// canonical (k-1)-mer yields the full successor (ext) and predecessor (pre)
// bitmap of a node. Slot layout (extmap.py ~:408):
//   [ rem : 64-log_size ][ valid:1 (bit 10) ][ choice:1 (bit 9) ][ payload:9 ]
// Overflow stash: sorted u64 keys + u16 payloads, binary-searched.
//
// Exposed C ABI (ctypes bridge: mindthegap_tpu/fill/traversal_native.py):
//   mtg_tsession_new / free / reset_marks
//   mtg_traverse_right          — one right extension (bench/unit parity)
//   mtg_construct_linear_seqs   — one full gap-fill job's contig list
//
// Build: g++ -O3 -shared -fPIC -o libmtgtraversal.so traversal.cpp

#include <cstdint>
#include <cstring>
#include <deque>
#include <string>
#include <unordered_set>
#include <vector>
#include <algorithm>

namespace {

// ---------------------------------------------------------------------------
// Needleman-Wunsch identity, same function as native/nw.cpp (reference
// src/Utils.cpp:87-189 semantics): gap -5, mismatch -5, match +10; identity
// = diagonal matches along traceback / max(len).
double nw_identity_(const char* a, int64_t n, const char* b, int64_t m)
{
    if (n == 0 || m == 0) return 0.0;
    const int32_t GAP = -5, MIS = -5, MATCH = 10;
    std::vector<int32_t> prev_s(m + 1), cur_s(m + 1), prev_f(m + 1), cur_f(m + 1);
    for (int64_t j = 0; j <= m; j++) { prev_s[j] = GAP * (int32_t)j; prev_f[j] = 0; }
    for (int64_t i = 1; i <= n; i++)
    {
        cur_s[0] = GAP * (int32_t)i;
        cur_f[0] = 0;
        const char ai = a[i - 1];
        for (int64_t j = 1; j <= m; j++)
        {
            const bool eq = ai == b[j - 1];
            const int32_t diag = prev_s[j - 1] + (eq ? MATCH : MIS);
            const int32_t up = prev_s[j] + GAP;
            const int32_t left = cur_s[j - 1] + GAP;
            int32_t s = std::max(diag, std::max(up, left));
            cur_s[j] = s;
            if (s == diag) cur_f[j] = prev_f[j - 1] + (eq ? 1 : 0);
            else if (s == up) cur_f[j] = prev_f[j];
            else cur_f[j] = cur_f[j - 1];
        }
        std::swap(prev_s, cur_s);
        std::swap(prev_f, cur_f);
    }
    return (double)prev_f[m] / (double)(n > m ? n : m);
}

// ---------------------------------------------------------------------------
// 2-bit k-mer helpers (alphabet A=0 C=1 T=2 G=3; complement = code ^ 2)

static inline uint64_t revcomp_u64(uint64_t x, int k)
{
    x = ((x & 0x3333333333333333ULL) << 2) | ((x >> 2) & 0x3333333333333333ULL);
    x = ((x & 0x0F0F0F0F0F0F0F0FULL) << 4) | ((x >> 4) & 0x0F0F0F0F0F0F0F0FULL);
    x = __builtin_bswap64(x);
    x ^= 0xAAAAAAAAAAAAAAAAULL;  // per-base complement (code ^ 2)
    return x >> (64 - 2 * k);
}

static inline uint64_t canonical_u64(uint64_t x, int k)
{
    uint64_t rc = revcomp_u64(x, k);
    return x < rc ? x : rc;
}

// bitmap positions b -> b ^ 2 (swap A<->T, C<->G lanes of a 4-bit mask)
static inline uint32_t shuffle02(uint32_t v)
{
    return ((v & 0x3u) << 2) | ((v >> 2) & 0x3u);
}

static const char* ALPHA = "ACTG";

// ---------------------------------------------------------------------------
// traversal policy — mirror of fill/traversal.py TraversalPolicy; the knob
// order is the ABI contract with traversal_native.py (POLICY_FIELDS).
struct Policy {
    int32_t in_branch_stop;
    int32_t explore_branching;
    int32_t bubble_max_depth;
    int32_t bubble_max_breadth;
    int32_t consensus_identity;
    int32_t start_mark;
    int32_t passed_branch_mark;
    int32_t branch_stop_mark;
    int32_t skip_marked_start;   // 0=skip 1=kmer 2=no
    int32_t stop_at_marked;
    int32_t explore_marked_fail;
    int32_t merge_reverse_check;
    int32_t swf_mode;            // 0=none 1=r_in_seq 2=seq_in_r 3=anchor_in_seq
    int32_t swf_noextend;
    int32_t push_on_marked_stop;
    int32_t marked_start_push;
    int32_t lifo;
    int32_t depth_with_kmer;
    int32_t max_nodes_strict;
};

enum Reason { R_TIP = 0, R_FORK = 1, R_MERGE = 2, R_MARKED = 3, R_MAXLEN = 4 };

struct Session {
    const uint64_t* slots;
    int32_t log_size;
    const uint64_t* stash_keys;
    const uint16_t* stash_pay;
    int32_t n_stash;
    int32_t k;
    Policy pol;
    std::unordered_set<uint64_t> marked;  // canonical k-mers

    uint64_t kmask;   // (1 << 2k) - 1
    uint64_t qmask;   // (1 << 2(k-1)) - 1

    // -- fused-map probe (traversal.py GraphView._payload_int) -------------
    inline uint32_t payload(uint64_t key) const
    {
        const int shift = 64 - log_size;
        const uint64_t rem_mask = (1ULL << shift) - 1;
        static const uint64_t consts[2] = {0x9E3779B97F4A7C15ULL, 0xC2B2AE3D27D4EB4FULL};
        for (int i = 0; i < 2; i++)
        {
            uint64_t h = (key ^ (key >> 33)) * consts[i];
            h ^= h >> 29;
            uint64_t v = slots[h >> shift];
            if ((v & 1024) && (v >> 11) == (h & rem_mask) && (((v >> 9) & 1) == (uint64_t)i))
                return (uint32_t)(v & 0x1FF);
        }
        // stash: sorted keys, binary search
        int lo = 0, hi = n_stash;
        while (lo < hi)
        {
            int mid = (lo + hi) >> 1;
            if (stash_keys[mid] < key) lo = mid + 1; else hi = mid;
        }
        if (lo < n_stash && stash_keys[lo] == key) return stash_pay[lo];
        return 0;
    }

    inline uint32_t ext_bits(uint64_t q) const
    {
        uint64_t cq = canonical_u64(q, k - 1);
        uint32_t pay = payload(cq);
        return q == cq ? (pay & 0xF) : shuffle02((pay >> 4) & 0xF);
    }

    inline uint32_t pre_bits(uint64_t q) const
    {
        uint64_t cq = canonical_u64(q, k - 1);
        uint32_t pay = payload(cq);
        return q == cq ? ((pay >> 4) & 0xF) : shuffle02(pay & 0xF);
    }

    // successor/predecessor sets; nts/nodes filled in nt order 0..3 like the
    // python engine (deterministic queue push order)
    inline int successors(uint64_t fwd, int* nts, uint64_t* nodes) const
    {
        uint32_t ext = ext_bits(fwd & qmask);
        int n = 0;
        for (int nt = 0; nt < 4; nt++)
            if ((ext >> nt) & 1) { nts[n] = nt; nodes[n] = ((fwd << 2) | (uint64_t)nt) & kmask; n++; }
        return n;
    }

    inline int predecessors(uint64_t fwd, uint64_t* nodes) const
    {
        uint32_t pre = pre_bits(fwd >> 2);
        int n = 0;
        const int shift = 2 * (k - 1);
        for (int nt = 0; nt < 4; nt++)
            if ((pre >> nt) & 1) nodes[n++] = (fwd >> 2) | ((uint64_t)nt << shift);
        return n;
    }

    inline int n_succ(uint64_t fwd) const { return __builtin_popcount(ext_bits(fwd & qmask)); }
    inline int n_pred(uint64_t fwd) const { return __builtin_popcount(pre_bits(fwd >> 2)); }

    inline bool is_branching(uint64_t fwd) const
    {
        return n_succ(fwd) != 1 || n_pred(fwd) != 1;
    }

    inline void mark(uint64_t fwd) { marked.insert(canonical_u64(fwd, k)); }
    inline bool is_marked(uint64_t fwd) const
    {
        return marked.count(canonical_u64(fwd, k)) != 0;
    }

    void kmer_str(uint64_t x, std::string& out) const
    {
        for (int i = k - 1; i >= 0; i--) out.push_back(ALPHA[(x >> (2 * i)) & 3]);
    }
};

// ---------------------------------------------------------------------------
// _find_end_of_branching: frontline BFS from a branching node until the
// frontline collapses to one node. Fails on external in-branching, dead /
// too-wide frontlines, depth cap, or (explore_marked_fail) marked frontier.
struct BranchEnd { uint64_t end; int depth; std::vector<uint64_t> involved; };

static bool find_end_of_branching(const Session& S, uint64_t start, BranchEnd& out)
{
    const Policy& P = S.pol;
    std::unordered_set<uint64_t> already;
    already.insert(canonical_u64(start, S.k));
    int nts[4]; uint64_t nodes[4], preds[4];
    std::vector<uint64_t> frontline;
    int n = S.successors(start, nts, nodes);
    for (int i = 0; i < n; i++)
    {
        frontline.push_back(nodes[i]);
        already.insert(canonical_u64(nodes[i], S.k));
    }
    if (P.explore_marked_fail)
        for (uint64_t f : frontline)
            if (S.is_marked(f)) return false;
    std::vector<uint64_t> involved = frontline;
    int depth = 1;
    std::vector<uint64_t> new_frontline;
    std::unordered_set<uint64_t> seen_new;
    while (depth < P.bubble_max_depth)
    {
        if (frontline.empty()) return false;
        if (frontline.size() == 1)
        {
            out.end = frontline[0];
            out.depth = depth;
            out.involved = std::move(involved);
            return true;
        }
        if ((int)frontline.size() > P.bubble_max_breadth) return false;
        new_frontline.clear();
        seen_new.clear();
        for (uint64_t node : frontline)
        {
            int ns = S.successors(node, nts, nodes);
            for (int i = 0; i < ns; i++)
            {
                uint64_t nxt = nodes[i];
                // external in-branching check
                int np = S.predecessors(nxt, preds);
                for (int j = 0; j < np; j++)
                    if (!already.count(canonical_u64(preds[j], S.k))) return false;
                if (P.explore_marked_fail && S.is_marked(nxt)) return false;
                uint64_t c = canonical_u64(nxt, S.k);
                if (already.count(c)) continue;
                already.insert(c);
                seen_new.insert(c);
                new_frontline.push_back(nxt);
            }
        }
        involved.insert(involved.end(), new_frontline.begin(), new_frontline.end());
        frontline = new_frontline;
        depth++;
    }
    return false;
}

// _reverse_collapse_ok: reverse frontline BFS admissibility test for
// crossing a pure merge (policy.merge_reverse_check).
static bool reverse_collapse_ok(const Session& S, uint64_t node)
{
    const Policy& P = S.pol;
    std::unordered_set<uint64_t> already;
    already.insert(canonical_u64(node, S.k));
    uint64_t preds[4];
    std::vector<uint64_t> frontline;
    int np = S.predecessors(node, preds);
    for (int i = 0; i < np; i++)
    {
        frontline.push_back(preds[i]);
        already.insert(canonical_u64(preds[i], S.k));
    }
    int depth = 1;
    std::vector<uint64_t> new_frontline;
    while (depth < P.bubble_max_depth)
    {
        if (frontline.size() <= 1) return true;
        if ((int)frontline.size() > P.bubble_max_breadth) return false;
        new_frontline.clear();
        for (uint64_t n : frontline)
        {
            int k2 = S.predecessors(n, preds);
            for (int i = 0; i < k2; i++)
            {
                uint64_t c = canonical_u64(preds[i], S.k);
                if (already.count(c)) continue;
                already.insert(c);
                new_frontline.push_back(preds[i]);
            }
        }
        frontline = new_frontline;
        depth++;
    }
    return false;
}

// _all_paths_between: all nt strings start -> end of length <= max_depth;
// returns false when the path count exceeds max_breadth (fail).
static bool all_paths_between(const Session& S, uint64_t start, uint64_t end,
                              int max_depth, int max_breadth,
                              std::vector<std::string>& out)
{
    out.clear();
    std::vector<std::pair<uint64_t, std::string>> stack;
    stack.emplace_back(start, std::string());
    int nts[4]; uint64_t nodes[4];
    while (!stack.empty())
    {
        uint64_t node = stack.back().first;
        std::string s = std::move(stack.back().second);
        stack.pop_back();
        if (node == end && !s.empty())
        {
            out.push_back(s);
            if ((int)out.size() > max_breadth) return false;
            continue;
        }
        if ((int)s.size() >= max_depth) continue;
        int n = S.successors(node, nts, nodes);
        for (int i = 0; i < n; i++)
        {
            std::string t = s;
            t.push_back(ALPHA[nts[i]]);
            stack.emplace_back(nodes[i], std::move(t));
        }
    }
    return true;
}

// _explore_branching: cross a tip/clean bubble -> (consensus, end) or fail.
static bool explore_branching(Session& S, uint64_t node, std::string& consensus, uint64_t& end)
{
    const Policy& P = S.pol;
    BranchEnd be;
    if (!find_end_of_branching(S, node, be)) return false;
    std::vector<std::string> paths;
    if (!all_paths_between(S, node, be.end, be.depth + 1, P.bubble_max_breadth, paths))
        return false;
    if (paths.empty()) return false;
    if (paths.size() > 1)
        for (size_t i = 0; i < paths.size(); i++)
            for (size_t j = i + 1; j < paths.size(); j++)
                if (nw_identity_(paths[i].data(), paths[i].size(),
                                 paths[j].data(), paths[j].size()) * 100.0
                    < (double)P.consensus_identity)
                    return false;
    consensus = *std::min_element(paths.begin(), paths.end());
    for (uint64_t n : be.involved)
        if (S.is_branching(n)) S.mark(n);
    end = be.end;
    return true;
}

// traverse_right: the composed host_walk + per-event automaton of
// fill/traversal.py traverse_right_co driven by host_walk — one function,
// identical control flow.
static void traverse_right(Session& S, uint64_t start, int64_t maxlen,
                           std::string& seq, uint64_t& node_out, int& reason_out)
{
    const Policy& P = S.pol;
    seq.clear();
    S.kmer_str(start, seq);
    int64_t slen = S.k;
    uint64_t node = start;
    int reason = R_MAXLEN;
    int nts[4]; uint64_t nodes[4];
    while (slen < maxlen)
    {
        // -- host_walk: extend a pure simple path within budget -------------
        int64_t budget = maxlen - slen;
        int wreason = 2;  // 0=tip 1=event 2=budget
        int64_t walked = 0;
        while (walked < budget)
        {
            int ns = S.successors(node, nts, nodes);
            if (ns == 0) { wreason = 0; break; }
            if (ns > 1) { wreason = 1; break; }
            uint64_t nxt = nodes[0];
            if (S.n_pred(nxt) != 1) { wreason = 1; break; }
            if (S.n_succ(nxt) != 1) { wreason = 1; break; }
            seq.push_back(ALPHA[nts[0]]);
            walked++;
            node = nxt;
        }
        slen += walked;
        if (wreason == 2) break;            // budget: reason stays maxlen
        if (wreason == 0) { reason = R_TIP; break; }
        // -- event: replay ONE iteration of the reference loop body ---------
        int ns = S.successors(node, nts, nodes);
        if (ns == 0) { reason = R_TIP; break; }  // unreachable, kept for safety
        bool in_branch = ns > 1
            || (P.in_branch_stop && S.n_pred(nodes[0]) > 1);
        if (in_branch)
        {
            bool crossed = false;
            std::string cons;
            uint64_t cend = 0;
            bool merge_only = ns == 1;
            bool admissible = true;
            if (merge_only && P.merge_reverse_check)
                admissible = reverse_collapse_ok(S, nodes[0]);
            if (P.explore_branching && admissible)
                crossed = explore_branching(S, node, cons, cend);
            if (!crossed)
            {
                reason = ns > 1 ? R_FORK : R_MERGE;
                if (P.branch_stop_mark && ns > 1) S.mark(node);
                break;
            }
            seq += cons;
            slen += (int64_t)cons.size();
            node = cend;
            continue;
        }
        uint64_t nxt = nodes[0];
        if (S.is_branching(nxt))
        {
            if (P.stop_at_marked && S.is_marked(nxt)) { reason = R_MARKED; break; }
            if (P.passed_branch_mark) S.mark(nxt);
        }
        seq.push_back(ALPHA[nts[0]]);
        slen += 1;
        node = nxt;
    }
    node_out = node;
    reason_out = reason;
}

static bool swf_hit(const Session& S, const std::string& seq, const char* R, int64_t rlen)
{
    const Policy& P = S.pol;
    if (P.swf_mode == 0 || rlen == 0) return false;
    if (P.swf_mode == 1)  // r_in_seq
        return seq.find(std::string(R, rlen)) != std::string::npos;
    if (P.swf_mode == 2)  // seq_in_r
        return std::string(R, rlen).find(seq) != std::string::npos;
    // anchor_in_seq: any k-window of R at stride k found in seq
    for (int64_t i = 0; i + S.k <= rlen; i += S.k)
        if (seq.find(std::string(R + i, S.k)) != std::string::npos) return true;
    return false;
}

// construct_linear_seqs: the full per-job BFS (traversal.py
// construct_linear_seqs_co), contigs appended in emission order.
static void construct_linear_seqs(Session& S, uint64_t start, const char* R, int64_t rlen,
                                  int64_t max_depth, int64_t max_nodes, int swf,
                                  std::vector<std::string>& contigs)
{
    const Policy& P = S.pol;
    S.marked.clear();
    std::deque<std::pair<uint64_t, int64_t>> queue;
    queue.emplace_back(start, 0);
    contigs.clear();
    int nts[4]; uint64_t nodes[4];
    std::string seq;
    while (!queue.empty())
    {
        uint64_t cur;
        int64_t depth;
        if (P.lifo) { cur = queue.back().first; depth = queue.back().second; queue.pop_back(); }
        else { cur = queue.front().first; depth = queue.front().second; queue.pop_front(); }
        if (!contigs.empty() && S.is_marked(cur))
        {
            if (P.skip_marked_start == 0) continue;  // "skip"
            if (P.skip_marked_start == 1)            // "kmer"
            {
                seq.clear();
                S.kmer_str(cur, seq);
                contigs.push_back(seq);
                bool hit = swf != 0 && swf_hit(S, seq, R, rlen);
                if (hit && !P.swf_noextend) break;
                if (P.marked_start_push)
                {
                    int n = S.successors(cur, nts, nodes);
                    for (int i = 0; i < n; i++)
                        queue.emplace_back(nodes[i], depth + (int64_t)seq.size());
                }
                continue;
            }
            // "no": fall through to a normal extension
        }
        if (P.start_mark && S.is_branching(cur)) S.mark(cur);
        uint64_t last;
        int reason;
        traverse_right(S, cur, max_depth, seq, last, reason);
        contigs.push_back(seq);
        bool hit = swf != 0 && swf_hit(S, seq, R, rlen);
        if (hit && !P.swf_noextend) break;
        int64_t new_depth = depth + (P.depth_with_kmer ? (int64_t)seq.size()
                                                       : (int64_t)seq.size() - S.k);
        if (P.max_nodes_strict) { if ((int64_t)contigs.size() >= max_nodes) break; }
        else if ((int64_t)contigs.size() > max_nodes) break;
        if (new_depth > max_depth) continue;
        if (hit && P.swf_noextend) continue;
        if (reason == R_MARKED && !P.push_on_marked_stop) continue;
        int n = S.successors(last, nts, nodes);
        for (int i = 0; i < n; i++) queue.emplace_back(nodes[i], new_depth);
    }
}

}  // namespace

// ---------------------------------------------------------------------------
extern "C" {

void* mtg_tsession_new(const uint64_t* slots, int32_t log_size,
                       const uint64_t* stash_keys, const uint16_t* stash_pay,
                       int32_t n_stash, int32_t k, const int32_t* policy)
{
    Session* s = new Session();
    s->slots = slots;
    s->log_size = log_size;
    s->stash_keys = stash_keys;
    s->stash_pay = stash_pay;
    s->n_stash = n_stash;
    s->k = k;
    std::memcpy(&s->pol, policy, sizeof(Policy));
    s->kmask = (k >= 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    s->qmask = (1ULL << (2 * (k - 1))) - 1;
    return s;
}

void mtg_tsession_free(void* sp) { delete (Session*)sp; }

void mtg_tsession_reset_marks(void* sp) { ((Session*)sp)->marked.clear(); }

void mtg_tsession_set_policy(void* sp, const int32_t* policy)
{
    std::memcpy(&((Session*)sp)->pol, policy, sizeof(Policy));
}

// One right extension. Returns bytes written to out (or -(needed) when cap
// is too small); end node and stop reason via out params.
int64_t mtg_traverse_right(void* sp, uint64_t start, int64_t maxlen,
                           char* out, int64_t cap, uint64_t* end_node, int32_t* reason)
{
    Session& S = *(Session*)sp;
    std::string seq;
    uint64_t node;
    int r;
    traverse_right(S, start, maxlen, seq, node, r);
    *end_node = node;
    *reason = r;
    if ((int64_t)seq.size() > cap) return -(int64_t)seq.size();
    std::memcpy(out, seq.data(), seq.size());
    return (int64_t)seq.size();
}

// One full gap-fill job. Contigs are '\n'-joined in emission order.
// Returns total bytes written (or -(needed) when cap is too small).
int64_t mtg_construct_linear_seqs(void* sp, uint64_t start,
                                  const char* R, int64_t rlen,
                                  int64_t max_depth, int64_t max_nodes, int32_t swf,
                                  char* out, int64_t cap)
{
    Session& S = *(Session*)sp;
    std::vector<std::string> contigs;
    construct_linear_seqs(S, start, R, rlen, max_depth, max_nodes, swf, contigs);
    int64_t total = 0;
    for (const std::string& c : contigs) total += (int64_t)c.size() + 1;
    if (total > cap) return -total;
    int64_t pos = 0;
    for (const std::string& c : contigs)
    {
        std::memcpy(out + pos, c.data(), c.size());
        pos += (int64_t)c.size();
        out[pos++] = '\n';
    }
    return total;
}

}  // extern "C"
