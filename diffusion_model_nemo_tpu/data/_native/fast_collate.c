/* Native batch-collate kernel for the host data loader.
 *
 * The reference delegates host loading to torch DataLoader worker processes;
 * this framework's host runtime stays in-process and assembles batches by
 * copying N equally-sized items into one contiguous buffer. numpy's
 * np.stack does this single-threaded; for large batches (e.g. 128 x 7200
 * float32 audio segments or high-res images) a parallel copy saturates
 * host memory bandwidth instead.
 *
 * Built on demand with: gcc -O3 -march=native -fopenmp -shared -fPIC
 * (see native.py); falls back to numpy transparently if unavailable.
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

#ifdef _OPENMP
#include <omp.h>
#endif

/* Copy n items of item_bytes each from srcs[i] to dst + i*item_bytes. */
void fast_stack(const uint8_t **srcs, int64_t n, int64_t item_bytes, uint8_t *dst) {
    int64_t i;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n * item_bytes > (1 << 20))
#endif
    for (i = 0; i < n; ++i) {
        memcpy(dst + (size_t)i * (size_t)item_bytes, srcs[i], (size_t)item_bytes);
    }
}

/* Gather rows: dst[i] = src[idx[i]] for row-major src of row_bytes rows. */
void fast_gather(const uint8_t *src, const int64_t *idx, int64_t n,
                 int64_t row_bytes, uint8_t *dst) {
    int64_t i;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n * row_bytes > (1 << 20))
#endif
    for (i = 0; i < n; ++i) {
        memcpy(dst + (size_t)i * (size_t)row_bytes,
               src + (size_t)idx[i] * (size_t)row_bytes, (size_t)row_bytes);
    }
}
