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

int gcol_partialcol(int n, const int64_t *row_ptr, const int32_t *col_ind,
                    int k, int32_t *colors, int64_t max_iters, uint64_t seed) {
    Graph g{n, row_ptr, col_ind};
    std::mt19937_64 rng(seed);

    /* start from a greedy coloring truncated at k: overflow goes uncolored */
    std::vector<int> order(n);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int a, int b) { return g.deg(a) > g.deg(b); });
    greedy_in_order(g, order, colors);
    for (int v = 0; v < n; ++v)
        if (colors[v] >= k) colors[v] = -1;

    /* gamma[v][c] = colored neighbors of v carrying color c */
    std::vector<int> gamma(static_cast<size_t>(n) * k, 0);
    for (int v = 0; v < n; ++v)
        for (const int32_t *p = g.nbr_begin(v); p != g.nbr_end(v); ++p)
            if (colors[*p] >= 0) ++gamma[static_cast<size_t>(v) * k + colors[*p]];

    int n_uncolored = 0;
    for (int v = 0; v < n; ++v)
        if (colors[v] < 0) ++n_uncolored;

    std::vector<int64_t> tabu(static_cast<size_t>(n) * k, 0);
    std::uniform_int_distribution<int> tenure_extra(0, 9);

    std::vector<int32_t> best(colors, colors + n);
    int best_uncolored = n_uncolored;

    for (int64_t it = 1; it <= max_iters && n_uncolored > 0; ++it) {
        /* best move: color an uncolored vertex, evicting its conflicts.
         * delta(|U|) = gamma[v][c] - 1 */
        int best_v = -1, best_c = -1, best_delta = 1 << 30, ties = 0;
        for (int v = 0; v < n; ++v) {
            if (colors[v] >= 0) continue;
            for (int c = 0; c < k; ++c) {
                int delta = gamma[static_cast<size_t>(v) * k + c] - 1;
                bool is_tabu = tabu[static_cast<size_t>(v) * k + c] >= it;
                if (is_tabu && n_uncolored + delta >= best_uncolored)
                    continue; /* aspiration: only override for a new best */
                if (delta < best_delta) {
                    best_delta = delta;
                    best_v = v;
                    best_c = c;
                    ties = 1;
                } else if (delta == best_delta) {
                    ++ties;
                    if (static_cast<int>(rng() % ties) == 0) {
                        best_v = v;
                        best_c = c;
                    }
                }
            }
        }
        if (best_v < 0) {
            /* every move tabu: pick a random uncolored vertex and color */
            std::vector<int> unc;
            for (int v = 0; v < n; ++v)
                if (colors[v] < 0) unc.push_back(v);
            best_v = unc[rng() % unc.size()];
            best_c = static_cast<int>(rng() % k);
            best_delta =
                gamma[static_cast<size_t>(best_v) * k + best_c] - 1;
        }

        /* assign, evicting conflicting neighbors */
        colors[best_v] = best_c;
        --n_uncolored;
        for (const int32_t *p = g.nbr_begin(best_v); p != g.nbr_end(best_v);
             ++p)
            ++gamma[static_cast<size_t>(*p) * k + best_c];
        for (const int32_t *p = g.nbr_begin(best_v); p != g.nbr_end(best_v);
             ++p) {
            int u = *p;
            if (colors[u] != best_c || u == best_v) continue;
            colors[u] = -1;
            ++n_uncolored;
            for (const int32_t *q = g.nbr_begin(u); q != g.nbr_end(u); ++q)
                --gamma[static_cast<size_t>(*q) * k + best_c];
            /* the evicted vertex may not immediately reclaim this color */
            tabu[static_cast<size_t>(u) * k + best_c] =
                it + static_cast<int64_t>(0.6 * n_uncolored) +
                tenure_extra(rng);
        }
        if (n_uncolored < best_uncolored) {
            best_uncolored = n_uncolored;
            best.assign(colors, colors + n);
        }
    }

    std::memcpy(colors, best.data(), n * sizeof(int32_t));
    return best_uncolored == 0 ? k : -1;
}

int gcol_hillclimber(int n, const int64_t *row_ptr, const int32_t *col_ind,
                     int32_t *colors, int64_t max_iters, uint64_t seed) {
    Graph g{n, row_ptr, col_ind};
    std::mt19937_64 rng(seed);

    int best_k = gcol_dsatur(n, row_ptr, col_ind, colors);
    std::vector<int32_t> cur(colors, colors + n);
    int cur_k = best_k;

    for (int64_t it = 0; it < max_iters && best_k > 1; ++it) {
        /* group vertices by color class */
        std::vector<std::vector<int>> classes(cur_k);
        for (int v = 0; v < n; ++v) classes[cur[v]].push_back(v);

        /* class permutation schedule: largest-first, reversed, shuffled --
         * Culberson's iterated-greedy invariant: recoloring class-by-class
         * never increases the color count */
        std::vector<int> perm(cur_k);
        std::iota(perm.begin(), perm.end(), 0);
        switch (it % 3) {
        case 0:
            std::stable_sort(perm.begin(), perm.end(), [&](int a, int b) {
                return classes[a].size() > classes[b].size();
            });
            break;
        case 1:
            std::reverse(perm.begin(), perm.end());
            break;
        default:
            std::shuffle(perm.begin(), perm.end(), rng);
            break;
        }

        std::vector<int> order;
        order.reserve(n);
        for (int c : perm)
            for (int v : classes[c]) order.push_back(v);

        cur_k = greedy_in_order(g, order, cur.data());
        if (cur_k < best_k) {
            best_k = cur_k;
            std::memcpy(colors, cur.data(), n * sizeof(int32_t));
        }
    }
    if (best_k == 1) std::fill(colors, colors + n, 0);
    return best_k;
}

namespace {

/* one ant builds a k-class partial assignment guided by the trail matrix;
 * leftover vertices get random colors (conflicts resolved by the caller) */
void ant_build(const Graph &g, int k, const std::vector<double> &trail,
               int32_t *colors, std::mt19937_64 &rng) {
    const int n = g.n;
    std::fill(colors, colors + n, -1);
    std::vector<char> blocked(n, 0);  /* has a neighbor in current class */
    std::vector<int> cls;             /* members of the current class */
    int n_uncolored = n;

    for (int c = 0; c < k && n_uncolored > 0; ++c) {
        std::fill(blocked.begin(), blocked.end(), 0);
        cls.clear();
        while (true) {
            /* candidate weights: trail-to-class (mean) ^2 * (deg+1) */
            double total = 0.0;
            std::vector<std::pair<int, double>> cand;
            for (int v = 0; v < n; ++v) {
                if (colors[v] >= 0 || blocked[v]) continue;
                double tau = 1.0;
                if (!cls.empty()) {
                    double s = 0.0;
                    for (int u : cls)
                        s += trail[static_cast<size_t>(v) * n + u];
                    tau = s / cls.size();
                }
                double w = tau * tau * static_cast<double>(g.deg(v) + 1);
                cand.emplace_back(v, w);
                total += w;
            }
            if (cand.empty()) break;
            /* roulette-wheel selection */
            std::uniform_real_distribution<double> ud(0.0, total);
            double r = ud(rng);
            int pick = cand.back().first;
            for (auto &vw : cand) {
                r -= vw.second;
                if (r <= 0.0) {
                    pick = vw.first;
                    break;
                }
            }
            colors[pick] = c;
            cls.push_back(pick);
            --n_uncolored;
            for (const int32_t *p = g.nbr_begin(pick); p != g.nbr_end(pick);
                 ++p)
                blocked[*p] = 1;
        }
    }
    /* leftovers: random colors (the TabuCol polish cleans up) */
    std::uniform_int_distribution<int> cd(0, k - 1);
    for (int v = 0; v < n; ++v)
        if (colors[v] < 0) colors[v] = cd(rng);
}

}  /* namespace */

int gcol_antcol(int n, const int64_t *row_ptr, const int32_t *col_ind,
                int32_t *colors, int n_ants, int n_cycles, int64_t tabu_iters,
                uint64_t seed) {
    Graph g{n, row_ptr, col_ind};
    std::mt19937_64 rng(seed);
    const double evap = 0.75;  /* trail retention per cycle */

    int best_k = gcol_dsatur(n, row_ptr, col_ind, colors);
    std::vector<int32_t> best(colors, colors + n);

    std::vector<double> trail(static_cast<size_t>(n) * n, 1.0);
    std::vector<int32_t> cand(n), cycle_best(n);

    while (best_k > 1) {
        int k = best_k - 1;
        std::fill(trail.begin(), trail.end(), 1.0);
        bool found = false;

        for (int cyc = 0; cyc < n_cycles && !found; ++cyc) {
            int cb_conflicts = 1 << 30;
            for (int a = 0; a < n_ants; ++a) {
                ant_build(g, k, trail, cand.data(), rng);
                int conf = count_conflicts(g, cand.data());
                if (conf < cb_conflicts) {
                    cb_conflicts = conf;
                    cycle_best.assign(cand.begin(), cand.end());
                }
            }
            /* polish the cycle's best ant */
            if (cb_conflicts > 0 &&
                tabucol_run(g, k, cycle_best.data(), tabu_iters, rng))
                cb_conflicts = 0;
            if (cb_conflicts == 0) {
                best_k = k;
                best.assign(cycle_best.begin(), cycle_best.end());
                found = true;
                break;
            }
            /* evaporate + deposit from the cycle best */
            double dep = 1.0 / (1.0 + cb_conflicts);
            for (double &t : trail) t *= evap;
            std::vector<std::vector<int>> classes(k);
            for (int v = 0; v < n; ++v) classes[cycle_best[v]].push_back(v);
            for (auto &cls : classes)
                for (size_t i = 0; i < cls.size(); ++i)
                    for (size_t j = i + 1; j < cls.size(); ++j) {
                        trail[static_cast<size_t>(cls[i]) * n + cls[j]] += dep;
                        trail[static_cast<size_t>(cls[j]) * n + cls[i]] += dep;
                    }
        }
        if (!found) break;
    }

    std::memcpy(colors, best.data(), n * sizeof(int32_t));
    return best_k;
}

int gcol_rlf(int n, const int64_t *row_ptr, const int32_t *col_ind,
             int32_t *colors) {
    Graph g{n, row_ptr, col_ind};
    std::fill(colors, colors + n, -1);

    /* state per build: 0 = candidate for the current class,
     * 1 = forbidden (adjacent to a class member), colored vertices excluded */
    std::vector<char> forbidden(n, 0);
    std::vector<int> adj_forbidden(n, 0); /* neighbors in the forbidden set */
    int n_uncolored = n;
    int c = 0;

    while (n_uncolored > 0) {
        std::fill(forbidden.begin(), forbidden.end(), 0);
        std::fill(adj_forbidden.begin(), adj_forbidden.end(), 0);

        /* seed: uncolored vertex with most uncolored neighbors */
        int seed_v = -1;
        int64_t seed_deg = -1;
        for (int v = 0; v < n; ++v) {
            if (colors[v] >= 0) continue;
            int64_t d = 0;
            for (const int32_t *p = g.nbr_begin(v); p != g.nbr_end(v); ++p)
                if (colors[*p] < 0) ++d;
            if (d > seed_deg) {
                seed_deg = d;
                seed_v = v;
            }
        }

        int v = seed_v;
        while (v >= 0) {
            colors[v] = c;
            --n_uncolored;
            for (const int32_t *p = g.nbr_begin(v); p != g.nbr_end(v); ++p) {
                int u = *p;
                if (colors[u] >= 0 || forbidden[u]) continue;
                forbidden[u] = 1;
                for (const int32_t *q = g.nbr_begin(u); q != g.nbr_end(u);
                     ++q)
                    ++adj_forbidden[*q];
            }
            /* next member: candidate with max neighbors in the forbidden
             * set; ties broken by fewest candidate neighbors */
            v = -1;
            int best_af = -1;
            int64_t best_cd = 0;
            for (int u = 0; u < n; ++u) {
                if (colors[u] >= 0 || forbidden[u]) continue;
                int64_t cd = 0;
                for (const int32_t *q = g.nbr_begin(u); q != g.nbr_end(u);
                     ++q)
                    if (colors[*q] < 0 && !forbidden[*q]) ++cd;
                if (adj_forbidden[u] > best_af ||
                    (adj_forbidden[u] == best_af && cd < best_cd)) {
                    best_af = adj_forbidden[u];
                    best_cd = cd;
                    v = u;
                }
            }
        }
        ++c;
    }
    return c;
}

}  /* extern "C" */
