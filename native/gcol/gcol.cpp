/* gcol: graph-coloring algorithms (see gcol.h) */

#include "gcol.h"

#include <algorithm>
#include <cstring>
#include <numeric>
#include <random>
#include <set>
#include <vector>

namespace {

struct Graph {
    int n;
    const int64_t *row_ptr;
    const int32_t *col_ind;
    int64_t deg(int v) const { return row_ptr[v + 1] - row_ptr[v]; }
    const int32_t *nbr_begin(int v) const { return col_ind + row_ptr[v]; }
    const int32_t *nbr_end(int v) const { return col_ind + row_ptr[v + 1]; }
};

int greedy_in_order(const Graph &g, const std::vector<int> &order,
                    int32_t *colors) {
    std::fill(colors, colors + g.n, -1);
    std::vector<int> used(g.n + 1, -1);
    int n_colors = 0;
    for (int v : order) {
        for (const int32_t *p = g.nbr_begin(v); p != g.nbr_end(v); ++p) {
            if (colors[*p] >= 0) used[colors[*p]] = v;
        }
        int c = 0;
        while (used[c] == v) ++c;
        colors[v] = c;
        n_colors = std::max(n_colors, c + 1);
    }
    return n_colors;
}

int count_conflicts(const Graph &g, const int32_t *colors) {
    int conflicts = 0;
    for (int v = 0; v < g.n; ++v)
        for (const int32_t *p = g.nbr_begin(v); p != g.nbr_end(v); ++p)
            if (*p > v && colors[*p] == colors[v]) ++conflicts;
    return conflicts;
}

/* tabu search on the number of conflicting edges for a fixed k */
bool tabucol_run(const Graph &g, int k, int32_t *colors, int64_t max_iters,
                 std::mt19937_64 &rng) {
    const int n = g.n;
    /* conflict table: gamma[v][c] = number of neighbors of v with color c */
    std::vector<int> gamma(static_cast<size_t>(n) * k, 0);
    for (int v = 0; v < n; ++v)
        for (const int32_t *p = g.nbr_begin(v); p != g.nbr_end(v); ++p)
            ++gamma[static_cast<size_t>(v) * k + colors[*p]];

    int conflicts = count_conflicts(g, colors);
    if (conflicts == 0) return true;

    std::vector<int64_t> tabu(static_cast<size_t>(n) * k, 0);
    std::uniform_int_distribution<int> tenure_extra(0, 9);

    for (int64_t it = 1; it <= max_iters && conflicts > 0; ++it) {
        /* best non-tabu (or aspiration) move among conflicted vertices */
        int best_v = -1, best_c = -1, best_delta = 1 << 30;
        int ties = 0;
        for (int v = 0; v < n; ++v) {
            int cv = colors[v];
            int v_conf = gamma[static_cast<size_t>(v) * k + cv];
            if (v_conf == 0) continue;
            for (int c = 0; c < k; ++c) {
                if (c == cv) continue;
                int delta = gamma[static_cast<size_t>(v) * k + c] - v_conf;
                bool is_tabu = tabu[static_cast<size_t>(v) * k + c] >= it;
                if (is_tabu && conflicts + delta > 0) continue; /* aspiration */
                if (delta < best_delta) {
                    best_delta = delta;
                    best_v = v;
                    best_c = c;
                    ties = 1;
                } else if (delta == best_delta) {
                    /* reservoir-sample among ties */
                    ++ties;
                    if (static_cast<int>(rng() % ties) == 0) {
                        best_v = v;
                        best_c = c;
                    }
                }
            }
        }
        if (best_v < 0) {
            /* all moves tabu: random restart move */
            std::uniform_int_distribution<int> vd(0, n - 1), cd(0, k - 1);
            best_v = vd(rng);
            best_c = cd(rng);
            if (best_c == colors[best_v]) best_c = (best_c + 1) % k;
            best_delta = gamma[static_cast<size_t>(best_v) * k + best_c] -
                         gamma[static_cast<size_t>(best_v) * k + colors[best_v]];
        }

        int old_c = colors[best_v];
        colors[best_v] = best_c;
        conflicts += best_delta;
        tabu[static_cast<size_t>(best_v) * k + old_c] =
            it + static_cast<int64_t>(0.6 * conflicts) + tenure_extra(rng);
        for (const int32_t *p = g.nbr_begin(best_v); p != g.nbr_end(best_v);
             ++p) {
            --gamma[static_cast<size_t>(*p) * k + old_c];
            ++gamma[static_cast<size_t>(*p) * k + best_c];
        }
    }
    return conflicts == 0;
}

/* greedy partition crossover (GPX) of two k-partitions */
void gpx_crossover(const Graph &g, int k, const int32_t *pa, const int32_t *pb,
                   int32_t *child, std::mt19937_64 &rng) {
    const int n = g.n;
    std::vector<std::vector<int>> classes_a(k), classes_b(k);
    std::vector<char> assigned(n, 0);
    for (int v = 0; v < n; ++v) {
        classes_a[pa[v]].push_back(v);
        classes_b[pb[v]].push_back(v);
    }
    std::fill(child, child + n, -1);
    for (int c = 0; c < k; ++c) {
        auto &classes = (c % 2 == 0) ? classes_a : classes_b;
        /* pick the largest remaining class */
        int best = -1;
        size_t best_size = 0;
        for (int j = 0; j < k; ++j) {
            size_t size = 0;
            for (int v : classes[j])
                if (!assigned[v]) ++size;
            if (size > best_size) {
                best_size = size;
                best = j;
            }
        }
        if (best < 0) continue;
        for (int v : classes[best]) {
            if (!assigned[v]) {
                child[v] = c;
                assigned[v] = 1;
            }
        }
    }
    std::uniform_int_distribution<int> cd(0, k - 1);
    for (int v = 0; v < n; ++v)
        if (child[v] < 0) child[v] = cd(rng);
}

}  /* namespace */

extern "C" {

int gcol_greedy(int n, const int64_t *row_ptr, const int32_t *col_ind,
                int32_t *colors) {
    Graph g{n, row_ptr, col_ind};
    std::vector<int> order(n);
    std::iota(order.begin(), order.end(), 0);
    /* largest-degree-first ordering (Welsh-Powell) */
    std::stable_sort(order.begin(), order.end(),
                     [&](int a, int b) { return g.deg(a) > g.deg(b); });
    return greedy_in_order(g, order, colors);
}

int gcol_dsatur(int n, const int64_t *row_ptr, const int32_t *col_ind,
                int32_t *colors) {
    Graph g{n, row_ptr, col_ind};
    std::fill(colors, colors + n, -1);
    std::vector<std::set<int>> sat(n);
    std::vector<char> done(n, 0);
    int n_colors = 0;
    std::vector<int> used(n + 1, -1);
    for (int iter = 0; iter < n; ++iter) {
        /* max saturation, ties by degree */
        int v = -1;
        for (int u = 0; u < n; ++u) {
            if (done[u]) continue;
            if (v < 0 || sat[u].size() > sat[v].size() ||
                (sat[u].size() == sat[v].size() && g.deg(u) > g.deg(v)))
                v = u;
        }
        for (const int32_t *p = g.nbr_begin(v); p != g.nbr_end(v); ++p)
            if (colors[*p] >= 0) used[colors[*p]] = v;
        int c = 0;
        while (used[c] == v) ++c;
        colors[v] = c;
        done[v] = 1;
        n_colors = std::max(n_colors, c + 1);
        for (const int32_t *p = g.nbr_begin(v); p != g.nbr_end(v); ++p)
            if (!done[*p]) sat[*p].insert(c);
    }
    return n_colors;
}

namespace {

struct BtState {
    const Graph *g;
    int best_k;
    std::vector<int32_t> best_colors;
    int64_t nodes_left;
};

bool bt_recurse(BtState &st, std::vector<int32_t> &colors,
                std::vector<char> &done, int colored_cnt, int cur_k) {
    if (st.nodes_left-- <= 0) return false;  /* budget exhausted */
    const Graph &g = *st.g;
    if (colored_cnt == g.n) {
        if (cur_k < st.best_k) {
            st.best_k = cur_k;
            st.best_colors.assign(colors.begin(), colors.end());
        }
        return true;
    }
    /* DSatur choice: max saturation, ties by degree */
    int v = -1;
    int v_sat = -1;
    std::vector<char> seen(st.best_k + 1);
    for (int u = 0; u < g.n; ++u) {
        if (done[u]) continue;
        std::fill(seen.begin(), seen.end(), 0);
        int s = 0;
        for (const int32_t *p = g.nbr_begin(u); p != g.nbr_end(u); ++p)
            if (colors[*p] >= 0 && !seen[colors[*p]]) {
                seen[colors[*p]] = 1;
                ++s;
            }
        if (v < 0 || s > v_sat || (s == v_sat && g.deg(u) > g.deg(v))) {
            v = u;
            v_sat = s;
        }
    }
    std::vector<char> used(st.best_k + 1, 0);
    for (const int32_t *p = g.nbr_begin(v); p != g.nbr_end(v); ++p)
        if (colors[*p] >= 0) used[colors[*p]] = 1;
    int c_max = std::min(cur_k + 1, st.best_k - 1); /* prune: beat best_k */
    for (int c = 0; c < c_max; ++c) {
        if (used[c]) continue;
        colors[v] = c;
        done[v] = 1;
        bt_recurse(st, colors, done, colored_cnt + 1,
                   std::max(cur_k, c + 1));
        colors[v] = -1;
        done[v] = 0;
        if (st.nodes_left <= 0) return false;
    }
    return true;
}

}  /* namespace */

int gcol_backtracking_dsatur(int n, const int64_t *row_ptr,
                             const int32_t *col_ind, int32_t *colors,
                             int64_t node_budget) {
    Graph g{n, row_ptr, col_ind};
    BtState st;
    st.g = &g;
    st.best_k = gcol_dsatur(n, row_ptr, col_ind, colors);
    st.best_colors.assign(colors, colors + n);
    st.nodes_left = node_budget;

    std::vector<int32_t> work(n, -1);
    std::vector<char> done(n, 0);
    bt_recurse(st, work, done, 0, 0);

    std::memcpy(colors, st.best_colors.data(), n * sizeof(int32_t));
    return st.best_k;
}

int gcol_tabucol(int n, const int64_t *row_ptr, const int32_t *col_ind, int k,
                 int32_t *colors, int64_t max_iters, uint64_t seed) {
    Graph g{n, row_ptr, col_ind};
    std::mt19937_64 rng(seed);
    std::uniform_int_distribution<int> cd(0, k - 1);
    for (int v = 0; v < n; ++v) colors[v] = cd(rng);
    return tabucol_run(g, k, colors, max_iters, rng) ? k : -1;
}

int gcol_hybrid_ea(int n, const int64_t *row_ptr, const int32_t *col_ind,
                   int32_t *colors, int64_t max_iters, int pop_size,
                   uint64_t seed) {
    Graph g{n, row_ptr, col_ind};
    std::mt19937_64 rng(seed);

    int best_k = gcol_dsatur(n, row_ptr, col_ind, colors);
    std::vector<int32_t> best(colors, colors + n);

    while (best_k > 1) {
        int k = best_k - 1;
        /* population: project the best coloring down + random candidates,
         * each improved by TabuCol */
        bool found = false;
        std::vector<std::vector<int32_t>> pop;
        for (int i = 0; i < pop_size && !found; ++i) {
            std::vector<int32_t> cand(n);
            if (i == 0) {
                for (int v = 0; v < n; ++v)
                    cand[v] = std::min(best[v], k - 1);
            } else {
                std::uniform_int_distribution<int> cd(0, k - 1);
                for (int v = 0; v < n; ++v) cand[v] = cd(rng);
            }
            if (tabucol_run(g, k, cand.data(), max_iters, rng)) {
                best.assign(cand.begin(), cand.end());
                best_k = k;
                found = true;
                break;
            }
            pop.push_back(std::move(cand));
        }
        if (found) continue;

        /* crossover generations */
        bool improved = false;
        std::uniform_int_distribution<size_t> pd(0, pop.size() - 1);
        for (int gen = 0; gen < pop_size && !improved; ++gen) {
            size_t ia = pd(rng), ib = pd(rng);
            if (ib == ia) ib = (ib + 1) % pop.size();
            std::vector<int32_t> child(n);
            gpx_crossover(g, k, pop[ia].data(), pop[ib].data(), child.data(),
                          rng);
            if (tabucol_run(g, k, child.data(), max_iters, rng)) {
                best.assign(child.begin(), child.end());
                best_k = k;
                improved = true;
                break;
            }
            pop[pd(rng) % pop.size()] = std::move(child);
        }
        if (!improved) break;  /* k-1 not reachable within budget */
    }

    std::memcpy(colors, best.data(), n * sizeof(int32_t));
    return best_k;
}

}  /* extern "C" */
