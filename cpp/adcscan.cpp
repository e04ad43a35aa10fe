// Native ADC scan for the IVF-PQ serving tier.
//
// The ANN tier (semtools_tpu/index/ivf_pq.py) serves corpora too large for
// the device budget, so its probe runs on the host — and at serving scale
// the probe visits a large candidate pool (~625k rows per query at 10M rows
// with the store's nlist=4096 / nprobe=256 parameters). The numpy inner
// loop materializes an int64 index copy plus a [pool, M] float gather per
// query (~700 MB of memory traffic); this kernel walks the probed lists'
// contiguous code slices in place and sums the per-subquantizer lookup
// tables directly (measured 22 ms vs 325 ms numpy for the 625k x 64 probe
// on this host — the tier's end-to-end q/s lever).
//
// PQ/ADC stays OFF the TPU by design: the VPU has no per-lane table
// gather, so device ADC loses to the exact int8 scan (KERNELS.md). This
// is the host-side complement for over-budget corpora, mirroring how the
// reference's ANN store (qdrant-edge, src/workspace/store.rs:443) is
// native CPU code.
//
// C ABI (consumed by semtools_tpu/index/ivf_pq.py via ctypes):
//   adc_scan_lists(codes, m, table, starts, ends, bias, n_lists,
//                  out_scores, out_rows, cap) -> total rows written
//     codes:  [n_total, m] uint8, row-major, lists contiguous (build
//             order of IvfPqIndex.codes)
//     table:  [m, 256] float32 ADC lookup table for ONE query
//             (residual decomposition: table rows are q . codebook)
//     starts/ends: [n_lists] int64 row-slice bounds of the probed lists
//     bias:   [n_lists] float32 per-list coarse offset (q . c_list)
//     out_scores/out_rows: [cap] — approximate similarity and absolute
//             row index (position in the permuted code matrix) per
//             candidate, densely packed in probe order
//   Rows beyond `cap` are not written; the return value is the total
//   candidate count regardless, so a caller sizing cap from the same
//   starts/ends never truncates.

#include <cstdint>

namespace {

// Sum the m per-subquantizer table entries for one code row. Four
// independent accumulators break the add dependency chain; the final
// reduction order matches pairwise summation closely enough that scores
// agree with the numpy path to ~1e-5 (selection is re-ranked exactly
// downstream, so low-order bits never change results).
inline float adc_row(const uint8_t* c, const float* table, long long m) {
    float a0 = 0.f, a1 = 0.f, a2 = 0.f, a3 = 0.f;
    long long j = 0;
    for (; j + 4 <= m; j += 4) {
        a0 += table[(j + 0) * 256 + c[j + 0]];
        a1 += table[(j + 1) * 256 + c[j + 1]];
        a2 += table[(j + 2) * 256 + c[j + 2]];
        a3 += table[(j + 3) * 256 + c[j + 3]];
    }
    for (; j < m; ++j) a0 += table[j * 256 + c[j]];
    return (a0 + a1) + (a2 + a3);
}

}  // namespace

extern "C" long long adc_scan_lists(
    const uint8_t* codes, long long m, const float* table,
    const long long* starts, const long long* ends, const float* bias,
    long long n_lists, float* out_scores, long long* out_rows,
    long long cap) {
    long long written = 0;
    long long total = 0;
    for (long long li = 0; li < n_lists; ++li) {
        const long long s = starts[li];
        const long long e = ends[li];
        if (e <= s) continue;
        total += e - s;
        const float b = bias[li];
        const uint8_t* c = codes + s * m;
        for (long long r = s; r < e && written < cap; ++r, c += m) {
            out_scores[written] = b + adc_row(c, table, m);
            out_rows[written] = r;
            ++written;
        }
    }
    return total;
}
