// Host data-path kernels for rri_nmf_tpu (C, OpenMP).
//
// The reference builds its dense training matrix + binary observation mask
// from COO rating triples through scipy (reference
// sklearn_interface.py:78-102): two sparse-matrix materializations and two
// full-matrix zero-fills per fit. At production recommender scale
// (BASELINE.md: MovieLens-1M and beyond) that host step serializes before
// any TPU work can start. These kernels do the scatter in one
// OpenMP-parallel pass each, writing float32 buffers that device_put can
// ship without further conversion.
//
// Exposed via ctypes (no pybind11 in the build image); see
// rri_nmf_tpu/native/__init__.py.

#include <cstdint>
#include <cstring>

extern "C" {

// ABI version of this library. Bumped whenever an exported signature or
// buffer width changes (v2: plan_scatter's glo/slo outputs went int32 →
// uint8). The loader refuses a library reporting a different version and
// rebuilds from source — an mtime check alone cannot catch a stale .so
// whose timestamp survived a copy (archived mtimes, rsync -t), and a
// width-mismatched plan_scatter would write out of bounds.
int64_t nmfdata_abi_version(void) { return 2; }

// Scatter COO triples into a dense row-major (n x d) matrix and a binary
// mask. Duplicate (i, j) pairs ACCUMULATE (scipy.sparse.coo_matrix sums
// duplicates before toarray(), reference sklearn_interface.py:78-83) and
// the mask is derived from the final nonzero pattern (the reference builds
// it from Xtr.nonzero(), sklearn_interface.py:100-102 — so an entry whose
// accumulated value is exactly zero counts as unobserved).
// Returns 0 on success, -1 on out-of-range index.
int coo_to_dense_mask(const int64_t* rows, const int64_t* cols,
                      const double* vals, int64_t nnz,
                      int64_t n, int64_t d,
                      float* X_out, float* M_out) {
    // zero-fill in parallel (first-touch friendly for NUMA)
    #pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        std::memset(X_out + i * d, 0, sizeof(float) * (size_t)d);
        std::memset(M_out + i * d, 0, sizeof(float) * (size_t)d);
    }

    int bad = 0;
    #pragma omp parallel for schedule(static) reduction(|:bad)
    for (int64_t t = 0; t < nnz; ++t) {
        int64_t i = rows[t], j = cols[t];
        if (i < 0 || i >= n || j < 0 || j >= d) { bad |= 1; continue; }
        #pragma omp atomic
        X_out[i * d + j] += (float)vals[t];
    }
    if (bad) return -1;

    #pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i)
        for (int64_t j = 0; j < d; ++j)
            M_out[i * d + j] = (X_out[i * d + j] != 0.0f) ? 1.0f : 0.0f;
    return 0;
}

// ---------------------------------------------------------------------
// Sparse-plan bucketing (ops/sparse_mxu.py / ops/sparse_dma.py).
//
// The MXU chunk plans bucket every nonzero by its (scatter-tile,
// gather-tile) 128x128 tile of X. The NumPy formulation is an
// O(nnz log nnz) argsort plus ~8 full-array passes (permutes, scatters)
// — profiled at ~16 us/nnz on the deployment host, which DOMINATES
// whole sparse fits (7.5M nnz: ~80 s host vs ~60 ms/sweep device).
// Tile buckets are dense integers, so a counting sort does it in two
// O(nnz) passes with no sort at all:
//   pass A (plan_hist):     bucket histogram
//   (Python computes chunk offsets / group padding on the ~nchunks-sized
//    bucket level — cheap)
//   pass B (plan_scatter):  place each nonzero's value + local indices
//                           directly into its final padded chunk slot
// Serial: the deployment host is single-core; the loops are trivially
// OpenMP-able (per-thread histograms / atomic-capture cursors) if that
// changes.

static inline int64_t idx_at(const void* p, int is32, int64_t t) {
    return is32 ? (int64_t)((const int32_t*)p)[t] : ((const int64_t*)p)[t];
}

// Pass A: counts[(s/128)*n_gtiles + g/128]++ over all nonzeros.
// counts must arrive zeroed (n_gtiles*n_stiles entries).
void plan_hist(const void* g, const void* s, int64_t nnz,
               int g_is32, int s_is32, int64_t n_gtiles,
               int64_t* counts) {
    for (int64_t t = 0; t < nnz; ++t) {
        int64_t gt = idx_at(g, g_is32, t) >> 7;   // /128
        int64_t st = idx_at(s, s_is32, t) >> 7;
        counts[st * n_gtiles + gt]++;
    }
}

// Pass B: slot = slot_base[bucket] + cursor[bucket]++; write value and
// local (within-tile) gather/scatter indices. cursor arrives zeroed;
// vals/glo/slo arrive zeroed (padding slots must stay v = 0).
// glo/slo are uint8: local indices are `% 128` so they always fit, and
// the narrow form quarters both this pass's write traffic and the plan's
// host->device transfer (the device widens to int32 once on arrival —
// Mosaic kernels need >= 32-bit operands for 1-row slicing).
void plan_scatter(const void* g, const void* s, const void* v,
                  int64_t nnz, int g_is32, int s_is32, int v_is32,
                  int64_t n_gtiles, const int64_t* slot_base,
                  int64_t* cursor, void* vals_out,
                  uint8_t* glo_out, uint8_t* slo_out) {
    for (int64_t t = 0; t < nnz; ++t) {
        int64_t gi = idx_at(g, g_is32, t);
        int64_t si = idx_at(s, s_is32, t);
        int64_t b = (si >> 7) * n_gtiles + (gi >> 7);
        int64_t slot = slot_base[b] + cursor[b]++;
        if (v_is32)
            ((float*)vals_out)[slot] = ((const float*)v)[t];
        else
            ((double*)vals_out)[slot] = ((const double*)v)[t];
        glo_out[slot] = (uint8_t)(gi & 127);
        slo_out[slot] = (uint8_t)(si & 127);
    }
}

// Column document frequencies of a dense count matrix (tfidf prep,
// called by rri_nmf_tpu.matrixops.tfidf's host path):
// df[j] = #rows with X[i,j] > 0. Parallel over columns.
void column_df(const double* X, int64_t n, int64_t d, int64_t* df_out) {
    #pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < d; ++j) {
        int64_t c = 0;
        for (int64_t i = 0; i < n; ++i) c += (X[i * d + j] > 0.0);
        df_out[j] = c;
    }
}

}  // extern "C"
