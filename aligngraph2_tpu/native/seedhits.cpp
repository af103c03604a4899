// Native seed-hit enumeration for the seed-extend aligner.
//
// One pass per read chunk: rolling 2-bit k-mer codes over both strands
// (identical to ops/kmer.py kmer_codes_np + io/seqdb.py revcomp_codes),
// dense count/offset table lookup (max_occ masking baked into the count
// table at build time, ops/seedextend.py SeedIndex), and hit expansion
// — emitting only per-HIT arrays (stream id, in-stream query position,
// global target position).  Replaces a dozen 9M-element numpy passes
// with one cache-friendly loop; the downstream candidate binning stays
// in numpy on the ~100x smaller hit arrays.

#include <algorithm>
#include <cstddef>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <utility>
#include <vector>

using std::size_t;

namespace {
using std::int32_t;
using std::int64_t;
using std::uint16_t;
using std::uint8_t;
}

extern "C" {

// bases: concatenated 0..3 codes of the chunk's reads (forward strand);
// read_start: (n_reads+1) CSR offsets into bases.
// Streams are numbered 2*i (read i forward) and 2*i+1 (read i reverse
// complement), matching the tag order in find_candidates_batch.
// Returns the number of hits written, or -(needed) if cap is too small.
int64_t ags_seed(const uint8_t* bases, const int64_t* read_start,
                 int64_t n_reads, int64_t k,
                 const uint16_t* dense_cnt, const int32_t* dense_off,
                 const int64_t* sorted_pos,
                 int64_t cap,
                 int32_t* out_sid, int32_t* out_qpos, int64_t* out_tpos) {
    const int64_t mask = (k >= 32) ? -1 : ((int64_t)1 << (2 * k)) - 1;
    int64_t n_out = 0;
    int64_t needed = 0;
    std::vector<uint8_t> rc;
    for (int64_t r = 0; r < n_reads; ++r) {
        const int64_t lo = read_start[r], hi = read_start[r + 1];
        const int64_t n = hi - lo;
        if (n < k) continue;
        // reverse complement buffer
        rc.resize((size_t)n);
        for (int64_t i = 0; i < n; ++i)
            rc[(size_t)i] = (uint8_t)(3 - bases[hi - 1 - i]);
        for (int strand = 0; strand < 2; ++strand) {
            const uint8_t* seq = strand == 0 ? bases + lo : rc.data();
            const int32_t sid = (int32_t)(2 * r + strand);
            int64_t code = 0;
            for (int64_t i = 0; i < k - 1; ++i)
                code = ((code << 2) | seq[i]) & mask;
            for (int64_t p = 0; p + k <= n; ++p) {
                code = ((code << 2) | seq[p + k - 1]) & mask;
                const uint16_t c = dense_cnt[code];
                if (c == 0) continue;
                if (n_out + c > cap) {
                    needed += c;
                    continue;
                }
                const int32_t off = dense_off[code];
                for (uint16_t j = 0; j < c; ++j) {
                    out_sid[n_out] = sid;
                    out_qpos[n_out] = (int32_t)p;
                    out_tpos[n_out] = sorted_pos[off + j];
                    ++n_out;
                }
            }
        }
    }
    if (needed > 0) return -(n_out + needed);
    return n_out;
}

// Solid-kmer set: rolling codes over all reads, radix sort, run-length
// abundance histogram, and the reference's exact cutoff rule over the
// dense 4^k table including absent (abundance-0) entries
// (kmer_counter.cpp:58-77 / ops/kmer.py solid_min_abundance_sparse).
// Returns the number of solid codes written to *out_codes (malloc'd,
// ascending; freed with agk_free) and the cutoff via *out_cutoff.
// A cutoff of 0 returns 0 codes with *out_cutoff = 0 — the caller emits
// the full 4^k universe (the reference's degenerate regime).
int64_t agk_solid(const uint8_t* bases, const int64_t* read_start,
                  int64_t n_reads, int64_t k, double threshold,
                  int64_t** out_codes, int64_t* out_cutoff) {
    const uint32_t mask = (uint32_t)(((int64_t)1 << (2 * k)) - 1);
    const int64_t table_size = (int64_t)1 << (2 * k);
    int64_t total = 0;
    for (int64_t r = 0; r < n_reads; ++r) {
        int64_t n = read_start[r + 1] - read_start[r];
        if (n >= k) total += n - k + 1;
    }
    std::vector<uint32_t> codes((size_t)total);
    int64_t w = 0;
    for (int64_t r = 0; r < n_reads; ++r) {
        const int64_t lo = read_start[r], hi = read_start[r + 1];
        if (hi - lo < k) continue;
        uint32_t code = 0;
        for (int64_t i = lo; i < lo + k - 1; ++i)
            code = ((code << 2) | bases[i]) & mask;
        for (int64_t i = lo + k - 1; i < hi; ++i) {
            code = ((code << 2) | bases[i]) & mask;
            codes[(size_t)w++] = code;
        }
    }
    // radix sort: two passes of 15 bits (k <= 15 -> 30-bit keys)
    {
        const int BITS = 15;
        const size_t NB = (size_t)1 << BITS;
        std::vector<uint32_t> tmp((size_t)total);
        std::vector<int64_t> cnt(NB);
        uint32_t* src = codes.data();
        uint32_t* dst = tmp.data();
        for (int pass = 0; pass < 2; ++pass) {
            const int shift = pass * BITS;
            std::fill(cnt.begin(), cnt.end(), 0);
            for (int64_t i = 0; i < total; ++i)
                ++cnt[(src[i] >> shift) & (NB - 1)];
            int64_t acc = 0;
            for (size_t b = 0; b < NB; ++b) {
                int64_t c = cnt[b];
                cnt[b] = acc;
                acc += c;
            }
            for (int64_t i = 0; i < total; ++i)
                dst[cnt[(src[i] >> shift) & (NB - 1)]++] = src[i];
            std::swap(src, dst);
        }
        if (src != codes.data()) codes.swap(tmp);
    }
    // run-length scan: abundance histogram over distinct values
    std::vector<std::pair<int64_t, int64_t>> hist;  // (abundance, freq)
    {
        const int64_t DENSE = 4096;
        std::vector<int64_t> dense((size_t)DENSE, 0);
        std::vector<std::pair<int64_t, int64_t>> big;  // rare long runs
        int64_t n_runs = 0;
        int64_t i = 0;
        while (i < total) {
            int64_t j = i + 1;
            while (j < total && codes[(size_t)j] == codes[(size_t)i]) ++j;
            int64_t ab = j - i;
            if (ab < DENSE) {
                ++dense[(size_t)ab];
            } else {
                bool found = false;
                for (auto& e : big)
                    if (e.first == ab) { ++e.second; found = true; break; }
                if (!found) big.push_back({ab, 1});
            }
            ++n_runs;
            i = j;
        }
        int64_t zero_entries = table_size - n_runs;
        if (zero_entries > 0) hist.push_back({0, zero_entries});
        for (int64_t ab = 1; ab < DENSE; ++ab)
            if (dense[(size_t)ab]) hist.push_back({ab, dense[(size_t)ab]});
        for (auto& e : big) hist.push_back(e);
        std::sort(hist.begin(), hist.end());
    }
    // cutoff rule: smallest abundance where the strictly-greater mass
    // fraction of table entries drops to <= threshold
    int64_t cutoff = 0;
    {
        int64_t cum = 0;
        for (auto& e : hist) {
            cum += e.second;
            if (1.0 - (double)cum / (double)table_size <= threshold) {
                cutoff = e.first;
                break;
            }
        }
    }
    *out_cutoff = cutoff;
    if (cutoff == 0) {
        *out_codes = nullptr;
        return 0;
    }
    // collect codes with abundance >= cutoff (ascending)
    int64_t n_solid = 0;
    {
        int64_t i = 0;
        while (i < total) {
            int64_t j = i + 1;
            while (j < total && codes[(size_t)j] == codes[(size_t)i]) ++j;
            if (j - i >= cutoff) ++n_solid;
            i = j;
        }
    }
    int64_t* out = (int64_t*)std::malloc(
        sizeof(int64_t) * (size_t)std::max<int64_t>(n_solid, 1));
    if (!out) return -1;
    int64_t wr = 0;
    {
        int64_t i = 0;
        while (i < total) {
            int64_t j = i + 1;
            while (j < total && codes[(size_t)j] == codes[(size_t)i]) ++j;
            if (j - i >= cutoff) out[wr++] = (int64_t)codes[(size_t)i];
            i = j;
        }
    }
    *out_codes = out;
    return n_solid;
}

void agk_free(int64_t* p) { std::free(p); }

// Greedy stride sampling (PABruijnGraph.tcc sampleSequence /
// graph/pagraph.py sample_sequence): walk the sorted eligible positions
// left to right taking gaps of at least `stride`.  Returns the number
// of selected entries written to out.
int64_t ags_stride_sample(const int64_t* eligible, int64_t n,
                          int64_t stride, int64_t* out) {
    int64_t n_sel = 0;
    int64_t i = 0;
    while (i < n) {
        const int64_t p = eligible[i];
        out[n_sel++] = p;
        const int64_t next = p + stride;
        do {
            ++i;
        } while (i < n && eligible[i] < next);
    }
    return n_sel;
}

// Traceback run-length expansion (ops/banded_pallas.expand_packed_moves
// is the numpy specification; this is the production path — the numpy
// expansion of a 1024-lane batch costs ~160 ms on a 2-vCPU host, ~40%
// of the whole DP+traceback wall).  Per lane b, the device walk emitted
// per-iteration codes: runs[b,it] DIAG moves then mvs[b,it] (if
// nonzero); expand into the dense END->START move matrix truncated at
// max_steps, and derive (n_moves, start_i, start_j) from the truncated
// counts exactly as the spec does.
void agx_expand(const uint8_t* runs, const uint8_t* mvs, int64_t B,
                int64_t C, int64_t stride, const int32_t* best_i,
                const int32_t* best_j, int64_t max_steps, uint8_t* moves,
                int32_t* n_out, int32_t* si_out, int32_t* sj_out) {
    const uint8_t DIAG = 1, UP = 2, LEFT = 3;
    for (int64_t b = 0; b < B; ++b) {
        const uint8_t* rb = runs + (size_t)b * (size_t)stride;
        const uint8_t* mb = mvs + (size_t)b * (size_t)stride;
        uint8_t* out = moves + (size_t)b * (size_t)max_steps;
        int64_t n = 0, ndiag = 0, nup = 0, nleft = 0;
        for (int64_t it = 0; it < C && n < max_steps; ++it) {
            int64_t r = rb[it];
            if (r > max_steps - n) r = max_steps - n;
            if (r > 0) {
                std::memset(out + n, DIAG, (size_t)r);
                n += r;
                ndiag += r;
            }
            const uint8_t mv = mb[it];
            if (mv != 0 && n < max_steps) {
                out[n++] = mv;
                if (mv == DIAG) ++ndiag;
                else if (mv == UP) ++nup;
                else if (mv == LEFT) ++nleft;
            }
        }
        std::memset(out + n, 0, (size_t)(max_steps - n));
        n_out[b] = (int32_t)n;
        si_out[b] = best_i[b] - (int32_t)(ndiag + nup);
        sj_out[b] = best_j[b] - (int32_t)nleft + (int32_t)nup;
    }
}

}  // extern "C"
