/* gcol CLI: color a DIMACS-format graph.
 *
 * usage: gcol <algorithm> <dimacs file> [-k colors] [-i max_iters]
 *             [-p pop_size] [-s seed] [-o solution file]
 *
 * algorithms: greedy | dsatur | rlf | backtracking | tabucol | partialcol
 *             | hillclimber | hybrid_ea | antcol
 * The solution file lists one 0-based color per vertex line (the format the
 * reference's IRF-coloring notebook consumes from the gCol executables).
 */

#include "gcol.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

int main(int argc, char **argv) {
    if (argc < 3) {
        std::fprintf(stderr,
                     "usage: %s <greedy|dsatur|rlf|backtracking|tabucol"
                     "|partialcol|hillclimber|hybrid_ea|antcol>"
                     " <dimacs file> [-k colors] [-i max_iters] [-p pop_size]"
                     " [-s seed] [-o solution file]\n",
                     argv[0]);
        return 2;
    }
    std::string algo = argv[1];
    const char *graph_fname = argv[2];
    int k = -1;
    int64_t max_iters = 100000;
    int pop_size = 10;
    uint64_t seed = 12345;
    const char *sol_fname = "solution.txt";
    for (int i = 3; i + 1 < argc; i += 2) {
        if (!std::strcmp(argv[i], "-k")) k = std::atoi(argv[i + 1]);
        else if (!std::strcmp(argv[i], "-i")) max_iters = std::atoll(argv[i + 1]);
        else if (!std::strcmp(argv[i], "-p")) pop_size = std::atoi(argv[i + 1]);
        else if (!std::strcmp(argv[i], "-s")) seed = std::strtoull(argv[i + 1], nullptr, 10);
        else if (!std::strcmp(argv[i], "-o")) sol_fname = argv[i + 1];
    }

    /* parse DIMACS: "p edge N M" header, "e u v" edges (1-based) */
    std::FILE *fp = std::fopen(graph_fname, "r");
    if (!fp) {
        std::fprintf(stderr, "cannot open %s\n", graph_fname);
        return 2;
    }
    int n = 0;
    long m = 0;
    std::vector<std::pair<int, int>> edges;
    char line[512];
    while (std::fgets(line, sizeof(line), fp)) {
        if (line[0] == 'p') {
            std::sscanf(line, "p edge %d %ld", &n, &m);
            edges.reserve(m);
        } else if (line[0] == 'e') {
            int u, v;
            if (std::sscanf(line, "e %d %d", &u, &v) == 2 && u != v)
                edges.emplace_back(u - 1, v - 1);
        }
    }
    std::fclose(fp);
    if (n <= 0) {
        std::fprintf(stderr, "no 'p edge' header found\n");
        return 2;
    }

    /* build symmetric CSR */
    std::vector<int64_t> row_ptr(n + 1, 0);
    for (auto &e : edges) {
        ++row_ptr[e.first + 1];
        ++row_ptr[e.second + 1];
    }
    for (int v = 0; v < n; ++v) row_ptr[v + 1] += row_ptr[v];
    std::vector<int32_t> col_ind(row_ptr[n]);
    std::vector<int64_t> fill(row_ptr.begin(), row_ptr.end() - 1);
    for (auto &e : edges) {
        col_ind[fill[e.first]++] = e.second;
        col_ind[fill[e.second]++] = e.first;
    }

    std::vector<int32_t> colors(n, -1);
    int n_colors = -1;
    if (algo == "greedy")
        n_colors = gcol_greedy(n, row_ptr.data(), col_ind.data(), colors.data());
    else if (algo == "dsatur")
        n_colors = gcol_dsatur(n, row_ptr.data(), col_ind.data(), colors.data());
    else if (algo == "backtracking")
        n_colors = gcol_backtracking_dsatur(n, row_ptr.data(), col_ind.data(),
                                            colors.data(), max_iters);
    else if (algo == "tabucol") {
        if (k <= 0) {
            std::fprintf(stderr, "tabucol requires -k\n");
            return 2;
        }
        n_colors = gcol_tabucol(n, row_ptr.data(), col_ind.data(), k,
                                colors.data(), max_iters, seed);
    } else if (algo == "partialcol") {
        if (k <= 0) {
            std::fprintf(stderr, "partialcol requires -k\n");
            return 2;
        }
        n_colors = gcol_partialcol(n, row_ptr.data(), col_ind.data(), k,
                                   colors.data(), max_iters, seed);
    } else if (algo == "hillclimber")
        n_colors = gcol_hillclimber(n, row_ptr.data(), col_ind.data(),
                                    colors.data(), max_iters, seed);
    else if (algo == "rlf")
        n_colors = gcol_rlf(n, row_ptr.data(), col_ind.data(), colors.data());
    else if (algo == "hybrid_ea")
        n_colors = gcol_hybrid_ea(n, row_ptr.data(), col_ind.data(),
                                  colors.data(), max_iters, pop_size, seed);
    else if (algo == "antcol")
        n_colors = gcol_antcol(n, row_ptr.data(), col_ind.data(),
                               colors.data(), pop_size, /*n_cycles=*/50,
                               max_iters, seed);
    else {
        std::fprintf(stderr, "unknown algorithm %s\n", algo.c_str());
        return 2;
    }

    if (n_colors < 0) {
        std::fprintf(stderr, "no proper coloring found\n");
        return 1;
    }

    std::FILE *out = std::fopen(sol_fname, "w");
    std::fprintf(out, "%d\n", n_colors);
    for (int v = 0; v < n; ++v) std::fprintf(out, "%d\n", colors[v]);
    std::fclose(out);
    std::printf("colors: %d\n", n_colors);
    return 0;
}
