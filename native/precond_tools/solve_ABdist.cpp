/* solve_ABdist: solve the assembled sparse preconditioner systems.
 *
 * Native counterpart of the external MPI/SuperLU_DIST `solve_ABdist` tool the
 * reference invokes (nk_ooc/cime_pop/model_state.py:317-337).  Reads a gen_A
 * matrix file (CSR + row_to_cell mapping), gathers the named tracer fields
 * from the state file into matrix-row vectors, solves A x = b for each with
 * ILU(0)-preconditioned BiCGSTAB (OpenMP-parallel matvecs; the -n nprow,npcol
 * process-grid argument sizes the thread pool), and scatters the solutions
 * back into the state file in place.
 *
 * usage: solve_ABdist [-D1] -n nprow,npcol -v var1,var2,... matrix.nc state.nc
 */

#include "nc3.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <sstream>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Csr {
    int64_t n;
    std::vector<int64_t> row_ptr;
    std::vector<int64_t> col_ind;
    std::vector<double> data;
};

void matvec(const Csr &a, const std::vector<double> &x, std::vector<double> &y) {
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < a.n; ++r) {
        double s = 0.0;
        for (int64_t p = a.row_ptr[r]; p < a.row_ptr[r + 1]; ++p)
            s += a.data[p] * x[a.col_ind[p]];
        y[r] = s;
    }
}

/* ILU(0): incomplete LU with the sparsity of A (in-place on a copy).
 *
 * LEVEL-SCHEDULED: rows are grouped into dependency levels of the L (and,
 * separately, U) sparsity DAG -- level(r) = 1 + max level over the rows r
 * reads -- so every row inside one level factors/solves independently and
 * the whole BiCGSTAB iteration threads, not just the matvecs (the
 * reference covers this grid class with a 64/256-rank SuperLU_DIST job,
 * /root/reference/input/cime_pop/tracer_module_defs.yaml:31-37; this is
 * the shared-memory analog for the TPU-less fallback host).  The same L
 * levels schedule the IKJ factorization: row r's elimination reads only
 * fully-factored rows at strictly lower levels. */
struct Ilu0 {
    Csr lu;
    std::vector<int64_t> diag;  /* position of the diagonal in each row */
    /* rows grouped by level: order[level_ptr[l] .. level_ptr[l+1]) */
    std::vector<int64_t> l_order, l_ptr, u_order, u_ptr;
    int64_t n_levels_l = 0, n_levels_u = 0;

    void build_levels() {
        const int64_t n = lu.n;
        std::vector<int64_t> lev(n, 0);
        for (int64_t r = 0; r < n; ++r)
            for (int64_t p = lu.row_ptr[r]; p < lu.row_ptr[r + 1]; ++p) {
                int64_t c = lu.col_ind[p];
                if (c >= r) break;
                if (lev[c] + 1 > lev[r]) lev[r] = lev[c] + 1;
            }
        n_levels_l = 0;
        for (int64_t r = 0; r < n; ++r)
            if (lev[r] + 1 > n_levels_l) n_levels_l = lev[r] + 1;
        l_ptr.assign(n_levels_l + 1, 0);
        for (int64_t r = 0; r < n; ++r) ++l_ptr[lev[r] + 1];
        for (int64_t l = 0; l < n_levels_l; ++l) l_ptr[l + 1] += l_ptr[l];
        l_order.resize(n);
        {
            std::vector<int64_t> fill(l_ptr.begin(), l_ptr.end() - 1);
            for (int64_t r = 0; r < n; ++r) l_order[fill[lev[r]]++] = r;
        }
        std::fill(lev.begin(), lev.end(), 0);
        for (int64_t r = n - 1; r >= 0; --r)
            for (int64_t p = lu.row_ptr[r + 1] - 1; p >= lu.row_ptr[r]; --p) {
                int64_t c = lu.col_ind[p];
                if (c <= r) break;
                if (lev[c] + 1 > lev[r]) lev[r] = lev[c] + 1;
            }
        n_levels_u = 0;
        for (int64_t r = 0; r < n; ++r)
            if (lev[r] + 1 > n_levels_u) n_levels_u = lev[r] + 1;
        u_ptr.assign(n_levels_u + 1, 0);
        for (int64_t r = 0; r < n; ++r) ++u_ptr[lev[r] + 1];
        for (int64_t l = 0; l < n_levels_u; ++l) u_ptr[l + 1] += u_ptr[l];
        u_order.resize(n);
        {
            std::vector<int64_t> fill(u_ptr.begin(), u_ptr.end() - 1);
            for (int64_t r = 0; r < n; ++r) u_order[fill[lev[r]]++] = r;
        }
    }

    void factor_row(int64_t r) {
        for (int64_t p = lu.row_ptr[r]; p < lu.row_ptr[r + 1]; ++p) {
            int64_t c = lu.col_ind[p];
            if (c >= r) break;
            if (diag[c] < 0 || lu.data[diag[c]] == 0.0) continue;
            double factor = lu.data[p] / lu.data[diag[c]];
            lu.data[p] = factor;
            /* subtract factor * row c from row r (sparsity of r only) */
            int64_t pc = diag[c] + 1;
            int64_t pr = p + 1;
            while (pc < lu.row_ptr[c + 1] && pr < lu.row_ptr[r + 1]) {
                if (lu.col_ind[pc] == lu.col_ind[pr]) {
                    lu.data[pr] -= factor * lu.data[pc];
                    ++pc;
                    ++pr;
                } else if (lu.col_ind[pc] < lu.col_ind[pr]) {
                    ++pc;
                } else {
                    ++pr;
                }
            }
        }
    }

    explicit Ilu0(const Csr &a) : lu(a), diag(a.n, -1) {
        for (int64_t r = 0; r < lu.n; ++r)
            for (int64_t p = lu.row_ptr[r]; p < lu.row_ptr[r + 1]; ++p)
                if (lu.col_ind[p] == r) diag[r] = p;
        build_levels();
        /* level-parallel IKJ factorization: within a level no row reads
         * another (all read rows sit at strictly lower levels, already
         * complete when the level starts) */
        for (int64_t l = 0; l < n_levels_l; ++l) {
#pragma omp parallel for schedule(static)
            for (int64_t i = l_ptr[l]; i < l_ptr[l + 1]; ++i)
                factor_row(l_order[i]);
        }
    }

    void solve(const std::vector<double> &b, std::vector<double> &x) const {
        /* forward: L y = b (unit diagonal), level-parallel */
        for (int64_t l = 0; l < n_levels_l; ++l) {
#pragma omp parallel for schedule(static)
            for (int64_t i = l_ptr[l]; i < l_ptr[l + 1]; ++i) {
                int64_t r = l_order[i];
                double s = b[r];
                for (int64_t p = lu.row_ptr[r]; p < lu.row_ptr[r + 1]; ++p) {
                    int64_t c = lu.col_ind[p];
                    if (c >= r) break;
                    s -= lu.data[p] * x[c];
                }
                x[r] = s;
            }
        }
        /* backward: U x = y, level-parallel */
        for (int64_t l = 0; l < n_levels_u; ++l) {
#pragma omp parallel for schedule(static)
            for (int64_t i = u_ptr[l]; i < u_ptr[l + 1]; ++i) {
                int64_t r = u_order[i];
                double s = x[r];
                for (int64_t p = lu.row_ptr[r + 1] - 1;
                     p >= lu.row_ptr[r]; --p) {
                    int64_t c = lu.col_ind[p];
                    if (c <= r) break;
                    s -= lu.data[p] * x[c];
                }
                double d = (diag[r] >= 0) ? lu.data[diag[r]] : 1.0;
                x[r] = s / d;
            }
        }
    }
};

double dot(const std::vector<double> &a, const std::vector<double> &b) {
    double s = 0.0;
#pragma omp parallel for reduction(+ : s) schedule(static)
    for (int64_t i = 0; i < static_cast<int64_t>(a.size()); ++i) s += a[i] * b[i];
    return s;
}

/* right-preconditioned BiCGSTAB */
bool bicgstab(const Csr &a, const Ilu0 &prec, const std::vector<double> &b,
              std::vector<double> &x, double rtol, int max_iters) {
    const int64_t n = a.n;
    std::vector<double> r(n), r0(n), p(n), v(n), s(n), t(n), y(n), z(n);
    std::fill(x.begin(), x.end(), 0.0);
    r = b;
    r0 = r;
    double rho = 1.0, alpha = 1.0, omega = 1.0;
    std::fill(p.begin(), p.end(), 0.0);
    std::fill(v.begin(), v.end(), 0.0);
    double bnorm = std::sqrt(dot(b, b));
    if (bnorm == 0.0) return true;

    for (int it = 0; it < max_iters; ++it) {
        double rho_new = dot(r0, r);
        if (rho_new == 0.0) return false;
        double beta = (rho_new / rho) * (alpha / omega);
        rho = rho_new;
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) p[i] = r[i] + beta * (p[i] - omega * v[i]);
        prec.solve(p, y);
        matvec(a, y, v);
        alpha = rho / dot(r0, v);
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) s[i] = r[i] - alpha * v[i];
        if (std::sqrt(dot(s, s)) < rtol * bnorm) {
            for (int64_t i = 0; i < n; ++i) x[i] += alpha * y[i];
            return true;
        }
        prec.solve(s, z);
        matvec(a, z, t);
        omega = dot(t, s) / dot(t, t);
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) {
            x[i] += alpha * y[i] + omega * z[i];
            r[i] = s[i] - omega * t[i];
        }
        if (std::sqrt(dot(r, r)) < rtol * bnorm) return true;
        if (omega == 0.0) return false;
    }
    return false;
}

}  /* namespace */

int main(int argc, char **argv) {
    std::string nprow_npcol = "1,1", varlist, matrix_fname, state_fname;
    for (int i = 1; i < argc; ++i) {
        if (!std::strcmp(argv[i], "-n") && i + 1 < argc) nprow_npcol = argv[++i];
        else if (!std::strcmp(argv[i], "-v") && i + 1 < argc) varlist = argv[++i];
        else if (!std::strcmp(argv[i], "-D1")) { /* debug level */ }
        else if (matrix_fname.empty()) matrix_fname = argv[i];
        else state_fname = argv[i];
    }
    if (matrix_fname.empty() || state_fname.empty() || varlist.empty()) {
        std::fprintf(stderr,
                     "usage: solve_ABdist [-D1] -n nprow,npcol -v vars "
                     "matrix.nc state.nc\n");
        return 2;
    }

#ifdef _OPENMP
    {
        int nprow = 1, npcol = 1;
        std::sscanf(nprow_npcol.c_str(), "%d,%d", &nprow, &npcol);
        omp_set_num_threads(std::max(1, nprow * npcol));
    }
#endif

    try {
        nc3::File mat_file = nc3::read(matrix_fname);
        const nc3::Var *rp = mat_file.find("row_ptr");
        const nc3::Var *ci = mat_file.find("col_ind");
        const nc3::Var *da = mat_file.find("data");
        const nc3::Var *r2c = mat_file.find("row_to_cell");
        if (!rp || !ci || !da || !r2c)
            throw std::runtime_error("matrix file lacks CSR vars");

        Csr a;
        a.n = static_cast<int64_t>(rp->size()) - 1;
        a.row_ptr.assign(rp->data.begin(), rp->data.end());
        a.col_ind.assign(ci->data.begin(), ci->data.end());
        a.data = da->data;

        Ilu0 prec(a);
        std::fprintf(stderr,
                     "solve_ABdist: n=%lld ILU(0) levels L=%lld U=%lld\n",
                     static_cast<long long>(a.n),
                     static_cast<long long>(prec.n_levels_l),
                     static_cast<long long>(prec.n_levels_u));

        nc3::File state = nc3::read(state_fname);

        std::stringstream ss(varlist);
        std::string varname;
        while (std::getline(ss, varname, ',')) {
            nc3::Var *var = state.find(varname);
            if (!var) throw std::runtime_error("state lacks var " + varname);
            std::vector<double> b(a.n), x(a.n);
            for (int64_t r = 0; r < a.n; ++r)
                b[r] = var->data[static_cast<size_t>(r2c->data[r])];
            if (!bicgstab(a, prec, b, x, 1.0e-12, 10000))
                throw std::runtime_error("BiCGSTAB failed for " + varname);
            for (int64_t r = 0; r < a.n; ++r)
                var->data[static_cast<size_t>(r2c->data[r])] = x[r];
            /* keep the _OLD twin consistent, as the original tool does */
            std::string old_name = varname;
            size_t pos = old_name.rfind("_CUR");
            if (pos != std::string::npos) {
                old_name.replace(pos, 4, "_OLD");
                nc3::Var *old_var = state.find(old_name);
                if (old_var) old_var->data = var->data;
            }
            std::printf("solve_ABdist: solved %s (n=%lld)\n", varname.c_str(),
                        static_cast<long long>(a.n));
        }

        nc3::write(state_fname, state);
        return 0;
    } catch (const std::exception &e) {
        std::fprintf(stderr, "solve_ABdist: %s\n", e.what());
        return 1;
    }
}
