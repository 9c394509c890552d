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
 *   partialcol        fixed-k tabu search over partial proper colorings
 *                     (objective = number of uncolored vertices)
 *   hybrid_ea         evolutionary algorithm with greedy partition crossover
 *                     and TabuCol local search, k decreasing from a DSatur
 *                     start (the algorithm the reference actually uses)
 *   hillclimber       iterated-greedy hill climbing: reorder color classes,
 *                     re-run greedy (never worse, often better)
 *   antcol            ant-colony construction of color classes guided by an
 *                     n x n same-color pheromone trail, k decreasing from a
 *                     DSatur start (O(n^2) trail memory: setup-time use only)
 *   rlf               recursive largest first: each color class built as a
 *                     maximal independent set (Leighton)
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

/* PartialCol: tabu search for a proper k-coloring over PARTIAL colorings --
 * uncolored vertices are the objective; assigning v color c evicts
 * conflicting neighbors back to the uncolored set.  Returns k on success,
 * -1 if vertices remain uncolored after max_iters */
int gcol_partialcol(int n_verts, const int64_t *row_ptr,
                    const int32_t *col_ind, int k, int32_t *colors,
                    int64_t max_iters, uint64_t seed);

/* iterated-greedy hill climber: DSatur start, then max_iters rounds of
 * color-class reordering + greedy recoloring (monotone non-increasing k) */
int gcol_hillclimber(int n_verts, const int64_t *row_ptr,
                     const int32_t *col_ind, int32_t *colors,
                     int64_t max_iters, uint64_t seed);

/* AntCol: DSatur start, then attempt k-1 colorings with n_ants ants per
 * cycle building color classes guided by a same-color pheromone trail,
 * each cycle's best assignment polished by TabuCol (tabu_iters) */
int gcol_antcol(int n_verts, const int64_t *row_ptr, const int32_t *col_ind,
                int32_t *colors, int n_ants, int n_cycles, int64_t tabu_iters,
                uint64_t seed);

/* RLF (recursive largest first): build each color class as a maximal
 * independent set, preferring vertices with many neighbors adjacent to the
 * class under construction (Leighton 1979) */
int gcol_rlf(int n_verts, const int64_t *row_ptr, const int32_t *col_ind,
             int32_t *colors);

}  /* extern "C" */

#endif
