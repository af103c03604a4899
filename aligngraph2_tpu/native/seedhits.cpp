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

#include <cstddef>
#include <cstdint>
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

}  // extern "C"
