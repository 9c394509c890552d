/* gcol: graph-coloring library for structurally-orthogonal Jacobian probing.
 *
 * The reference vendors the gCol suite (externals/gCol) and shells out to its
 * HybridEA executable to pack many impulse-response tracers into one forward
 * model run (Curtis-Powell-Reid coloring of the distance-2 adjacency graph).
 * This is a fresh implementation of the same algorithm families:
 *
 *   greedy            first-fit in a given (or degree-sorted) vertex order
 *   dsatur            saturation-degree ordering (Brelaz)
 *   backtracking      DSatur with exact backtracking under a node budget
 *   tabucol           fixed-k tabu search on conflict count
 *   hybrid_ea         evolutionary algorithm with greedy partition crossover
 *                     and TabuCol local search, k decreasing from a DSatur
 *                     start (the algorithm the reference actually uses)
 *
 * C API (ctypes-friendly): graphs are CSR adjacency (undirected, both
 * directions present).  All functions return the number of colors used and
 * fill colors[v] with 0-based color indices, or -1 on failure.
 */

#ifndef NK_TPU_GCOL_H
#define NK_TPU_GCOL_H

#include <cstdint>

extern "C" {

int gcol_greedy(int n_verts, const int64_t *row_ptr, const int32_t *col_ind,
                int32_t *colors);

int gcol_dsatur(int n_verts, const int64_t *row_ptr, const int32_t *col_ind,
                int32_t *colors);

/* exact-leaning DSatur with backtracking; node_budget bounds the search */
int gcol_backtracking_dsatur(int n_verts, const int64_t *row_ptr,
                             const int32_t *col_ind, int32_t *colors,
                             int64_t node_budget);

/* tabu search for a proper k-coloring; returns k on success, -1 if no
 * conflict-free coloring was found within max_iters */
int gcol_tabucol(int n_verts, const int64_t *row_ptr, const int32_t *col_ind,
                 int k, int32_t *colors, int64_t max_iters, uint64_t seed);

/* hybrid EA: start from DSatur, repeatedly attempt k-1 colorings with a
 * population of TabuCol-improved candidates */
int gcol_hybrid_ea(int n_verts, const int64_t *row_ptr, const int32_t *col_ind,
                   int32_t *colors, int64_t max_iters, int pop_size,
                   uint64_t seed);

}  /* extern "C" */

#endif
