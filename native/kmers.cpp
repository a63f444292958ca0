// Native k-mer extraction (k <= 32): rolling forward/canonical k-mers over
// 2-bit code arrays at ~0.2 GB/s-of-kmers, replacing an O(k*n) vectorized
// numpy loop (the graph-build extract was the host bottleneck: 8.2s for
// 16M kmers -> ~0.1s here). Reference semantics: A=0 C=1 T=2 G=3, complement
// = code^2, canonical = min(fwd, revcomp), k-mers containing INVALID (255)
// bases are invalid (reference Kmer model iterator isValid()).
//
// Build: g++ -O3 -shared -fPIC -o libmtgkmers.so kmers.cpp

#include <cstdint>

typedef uint64_t u64;

extern "C" {

// Positional: fwd[i] + valid[i] for every position i in [0, n-k].
void extract_fwd(const uint8_t* codes, int64_t n, int k, u64* fwd, uint8_t* valid)
{
    const u64 mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    const int64_t npos = n - k + 1;
    u64 cur = 0;
    int bad_run = 0;  // #positions since last invalid base (saturating at k)
    for (int64_t i = 0; i < n; i++)
    {
        uint8_t c = codes[i];
        if (c > 3)
        {
            bad_run = 0;
            cur = (cur << 2) & mask;
        }
        else
        {
            if (bad_run < k) bad_run++;
            cur = ((cur << 2) | c) & mask;
        }
        int64_t pos = i - k + 1;
        if (pos >= 0 && pos < npos)
        {
            fwd[pos] = cur;
            valid[pos] = bad_run >= k;
        }
    }
}

// Compacted canonical stream for counting: writes only valid canonical
// k-mers, returns how many. out must hold n-k+1 entries.
int64_t extract_canonical(const uint8_t* codes, int64_t n, int k, u64* out)
{
    if (n < k) return 0;
    const u64 mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    const int rc_shift = 2 * (k - 1);
    u64 fwd = 0, rc = 0;
    int run = 0;
    int64_t m = 0;
    for (int64_t i = 0; i < n; i++)
    {
        uint8_t c = codes[i];
        if (c > 3)
        {
            run = 0;
            fwd = 0;
            rc = 0;
            continue;
        }
        fwd = ((fwd << 2) | c) & mask;
        rc = (rc >> 2) | ((u64)(c ^ 2) << rc_shift);
        if (run < k) run++;
        if (run >= k) out[m++] = fwd < rc ? fwd : rc;
    }
    return m;
}

}  // extern "C"
