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

/* ILU(0): incomplete LU with the sparsity of A (in-place on a copy) */
struct Ilu0 {
    Csr lu;
    std::vector<int64_t> diag;  /* position of the diagonal in each row */

    explicit Ilu0(const Csr &a) : lu(a), diag(a.n, -1) {
        for (int64_t r = 0; r < lu.n; ++r)
            for (int64_t p = lu.row_ptr[r]; p < lu.row_ptr[r + 1]; ++p)
                if (lu.col_ind[p] == r) diag[r] = p;
        for (int64_t r = 0; r < lu.n; ++r) {
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
    }

    void solve(const std::vector<double> &b, std::vector<double> &x) const {
        /* forward: L y = b (unit diagonal) */
        for (int64_t r = 0; r < lu.n; ++r) {
            double s = b[r];
            for (int64_t p = lu.row_ptr[r]; p < lu.row_ptr[r + 1]; ++p) {
                int64_t c = lu.col_ind[p];
                if (c >= r) break;
                s -= lu.data[p] * x[c];
            }
            x[r] = s;
        }
        /* backward: U x = y */
        for (int64_t r = lu.n - 1; r >= 0; --r) {
            double s = x[r];
            for (int64_t p = lu.row_ptr[r + 1] - 1; p >= lu.row_ptr[r]; --p) {
                int64_t c = lu.col_ind[p];
                if (c <= r) break;
                s -= lu.data[p] * x[c];
            }
            double d = (diag[r] >= 0) ? lu.data[diag[r]] : 1.0;
            x[r] = s / d;
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
        for (int64_t i = 0; i < n; ++i) p[i] = r[i] + beta * (p[i] - omega * v[i]);
        prec.solve(p, y);
        matvec(a, y, v);
        alpha = rho / dot(r0, v);
        for (int64_t i = 0; i < n; ++i) s[i] = r[i] - alpha * v[i];
        if (std::sqrt(dot(s, s)) < rtol * bnorm) {
            for (int64_t i = 0; i < n; ++i) x[i] += alpha * y[i];
            return true;
        }
        prec.solve(s, z);
        matvec(a, z, t);
        omega = dot(t, s) / dot(t, t);
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
