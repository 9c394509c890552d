/* gen_A: assemble sparse preconditioner matrices for the Krylov solver.
 *
 * Native counterpart of the external NK_ocn_tracer_jacobian_precond `gen_A`
 * tool the reference invokes (nk_ooc/cime_pop/model_state.py:84-87).  Reads an
 * options file (one "key value..." per line), assembles a CSR matrix
 * A = day_cnt*86400 * J - I over the masked grid cells, and writes it (with
 * the cell<->row mapping) to a netCDF-3 file consumed by solve_ABdist.
 *
 * supported options:
 *   day_cnt N                  model-run duration entering the scaling
 *   reg_fname FILE             grid file with region_mask (3D) [required]
 *   circ_fname FILE            circulation file (vertical diffusivity etc.)
 *   vmix_type file VAR | none  vertical mixing from circ-file VAR (VDC-style,
 *                              interface diffusivity in m^2/s) or disabled
 *   sink_type none | const RATE | const_shallow HOURS DEPTH_CM
 *                              first-order sink, everywhere or above a depth
 *   csr_fname FILE             add a precomputed CSR operator (row_ptr/
 *                              col_ind/data vars) -- external assemblies
 *   tracer_fname FILE          source of surface-flux derivative fields
 *   sf VAR                     surface-flux derivative d(SF)/d(tracer) from
 *                              tracer_fname applied to the surface layer
 *   adv_type ... / hmix_type ...   accepted and ignored with a warning
 *                              (full POP advection assembly: external tool)
 */

#include "nc3.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Triplet { int64_t row, col; double val; };

struct Options {
    double day_cnt = 365.0;
    std::string reg_fname, circ_fname, csr_fname, tracer_fname;
    std::string vmix_type = "none", vmix_var = "VDC";
    std::string sink_type = "none";
    double sink_rate = 0.0, sink_hours = 0.0, sink_depth_cm = 0.0;
    std::vector<std::string> sf_vars;
};

Options parse_opts(const std::string &fname) {
    Options o;
    std::ifstream in(fname);
    if (!in) throw std::runtime_error("cannot open opts file " + fname);
    std::string line;
    while (std::getline(in, line)) {
        std::istringstream ss(line);
        std::string key;
        if (!(ss >> key) || key.empty() || key[0] == '#') continue;
        if (key == "day_cnt") ss >> o.day_cnt;
        else if (key == "reg_fname") ss >> o.reg_fname;
        else if (key == "circ_fname") ss >> o.circ_fname;
        else if (key == "csr_fname") ss >> o.csr_fname;
        else if (key == "tracer_fname") ss >> o.tracer_fname;
        else if (key == "vmix_type") { ss >> o.vmix_type; if (o.vmix_type == "file") ss >> o.vmix_var; }
        else if (key == "sink_type") {
            ss >> o.sink_type;
            if (o.sink_type == "const") ss >> o.sink_rate;
            else if (o.sink_type == "const_shallow") ss >> o.sink_hours >> o.sink_depth_cm;
        } else if (key == "sf") {
            std::string var;
            ss >> var;
            o.sf_vars.push_back(var);
        } else {
            std::fprintf(stderr, "gen_A: option '%s' accepted but not assembled "
                                 "natively (use the external tool for it)\n",
                         key.c_str());
        }
    }
    return o;
}

}  /* namespace */

int main(int argc, char **argv) {
    std::string opts_fname, matrix_fname;
    for (int i = 1; i < argc; ++i) {
        if (!std::strcmp(argv[i], "-o") && i + 1 < argc) opts_fname = argv[++i];
        else if (!std::strcmp(argv[i], "-D1")) { /* debug level, accepted */ }
        else matrix_fname = argv[i];
    }
    if (opts_fname.empty() || matrix_fname.empty()) {
        std::fprintf(stderr, "usage: gen_A [-D1] -o opts_file matrix_fname\n");
        return 2;
    }

    try {
        Options opt = parse_opts(opts_fname);
        if (opt.reg_fname.empty())
            throw std::runtime_error("reg_fname option is required");

        nc3::File reg = nc3::read(opt.reg_fname);
        const nc3::Var *mask = reg.find("region_mask");
        if (!mask) throw std::runtime_error("region_mask not in reg_fname");
        const size_t ncells = mask->size();
        const size_t nz = mask->shape.size() >= 1 ? mask->shape[0] : 1;
        const size_t nhoriz = ncells / nz;

        /* masked cells (region > 0) become matrix rows, in C order */
        std::vector<int64_t> cell_to_row(ncells, -1);
        std::vector<int64_t> row_to_cell;
        for (size_t c = 0; c < ncells; ++c) {
            if (mask->data[c] > 0) {
                cell_to_row[c] = static_cast<int64_t>(row_to_cell.size());
                row_to_cell.push_back(static_cast<int64_t>(c));
            }
        }
        const int64_t nrows = static_cast<int64_t>(row_to_cell.size());

        const double delta_t = opt.day_cnt * 86400.0;
        std::vector<Triplet> trips;

        /* vertical mixing from the circulation file: flux-form tridiagonal
         * coupling between vertically adjacent masked cells */
        if (opt.vmix_type == "file") {
            if (opt.circ_fname.empty())
                throw std::runtime_error("vmix_type file requires circ_fname");
            nc3::File circ = nc3::read(opt.circ_fname);
            const nc3::Var *vdc = circ.find(opt.vmix_var);
            const nc3::Var *dz = circ.find("dz");
            if (!vdc || !dz)
                throw std::runtime_error("circ file lacks " + opt.vmix_var + "/dz");
            for (size_t k = 0; k + 1 < nz; ++k) {
                double dz_k = 1.0e-2 * dz->data[k];        /* cm -> m */
                double dz_k1 = 1.0e-2 * dz->data[k + 1];
                double dz_mid = 0.5 * (dz_k + dz_k1);
                for (size_t h = 0; h < nhoriz; ++h) {
                    size_t c0 = k * nhoriz + h, c1 = (k + 1) * nhoriz + h;
                    int64_t r0 = cell_to_row[c0], r1 = cell_to_row[c1];
                    if (r0 < 0 || r1 < 0) continue;
                    /* interface diffusivity below level k (VDC on interfaces) */
                    size_t vdc_ind = std::min(c0, vdc->size() - 1);
                    double kappa = 1.0e-4 * vdc->data[vdc_ind]; /* cm2/s->m2/s */
                    double coup = kappa / dz_mid;
                    trips.push_back({r0, r1, delta_t * coup / dz_k});
                    trips.push_back({r0, r0, -delta_t * coup / dz_k});
                    trips.push_back({r1, r0, delta_t * coup / dz_k1});
                    trips.push_back({r1, r1, -delta_t * coup / dz_k1});
                }
            }
        }

        /* precomputed CSR operator (external assembly pipelines) */
        if (!opt.csr_fname.empty()) {
            nc3::File csr = nc3::read(opt.csr_fname);
            const nc3::Var *rp = csr.find("row_ptr");
            const nc3::Var *ci = csr.find("col_ind");
            const nc3::Var *da = csr.find("data");
            if (!rp || !ci || !da)
                throw std::runtime_error("csr_fname lacks row_ptr/col_ind/data");
            for (int64_t r = 0; r + 1 < static_cast<int64_t>(rp->size()); ++r)
                for (int64_t p = static_cast<int64_t>(rp->data[r]);
                     p < static_cast<int64_t>(rp->data[r + 1]); ++p)
                    trips.push_back({r, static_cast<int64_t>(ci->data[p]),
                                     delta_t * da->data[p]});
        }

        /* first-order sink */
        if (opt.sink_type == "const") {
            for (int64_t r = 0; r < nrows; ++r)
                trips.push_back({r, r, -delta_t * opt.sink_rate});
        } else if (opt.sink_type == "const_shallow") {
            /* rate 1/(sink_hours hours) above sink_depth_cm */
            nc3::File circ = nc3::read(
                opt.circ_fname.empty() ? opt.reg_fname : opt.circ_fname);
            const nc3::Var *dz = circ.find("dz");
            double rate = 1.0 / (opt.sink_hours * 3600.0);
            double depth_cm = 0.0;
            for (size_t k = 0; k < nz; ++k) {
                double dz_k = dz ? dz->data[k] : opt.sink_depth_cm;
                if (depth_cm >= opt.sink_depth_cm) break;
                for (size_t h = 0; h < nhoriz; ++h) {
                    int64_t r = cell_to_row[k * nhoriz + h];
                    if (r >= 0) trips.push_back({r, r, -delta_t * rate});
                }
                depth_cm += dz_k;
            }
        }

        /* surface-flux derivative terms: d(SF)/d(tracer) applied to the
         * surface layer, scaled by delta_t / dz_surf */
        if (!opt.sf_vars.empty()) {
            if (opt.tracer_fname.empty())
                throw std::runtime_error("sf requires tracer_fname");
            nc3::File trf = nc3::read(opt.tracer_fname);
            const nc3::Var *dz = trf.find("dz");
            double dz_surf_cm = dz ? dz->data[0] : 1.0e2;
            for (auto &sf_var : opt.sf_vars) {
                const nc3::Var *sf = trf.find(sf_var);
                if (!sf) {
                    std::fprintf(stderr, "gen_A: sf var %s missing, skipped\n",
                                 sf_var.c_str());
                    continue;
                }
                for (size_t h = 0; h < nhoriz && h < sf->size(); ++h) {
                    int64_t r = cell_to_row[h];
                    if (r < 0) continue;
                    double val = sf->data[h];
                    if (std::abs(val) > 1.0e30) continue; /* fill value */
                    trips.push_back({r, r, delta_t / (1.0e-2 * dz_surf_cm) * val});
                }
            }
        }

        /* A = delta_t * J - I: subtract the identity */
        for (int64_t r = 0; r < nrows; ++r) trips.push_back({r, r, -1.0});

        /* triplets -> CSR (accumulate duplicates) */
        std::vector<std::map<int64_t, double>> rows(nrows);
        for (auto &t : trips) rows[t.row][t.col] += t.val;
        std::vector<double> row_ptr(nrows + 1, 0.0), col_ind, data;
        for (int64_t r = 0; r < nrows; ++r) {
            row_ptr[r + 1] = row_ptr[r] + static_cast<double>(rows[r].size());
            for (auto &kv : rows[r]) {
                col_ind.push_back(static_cast<double>(kv.first));
                data.push_back(kv.second);
            }
        }

        nc3::File out;
        out.text_gatts["history"] = "created by native gen_A";
        out.add_dim("rows", nrows);
        out.add_dim("rows_p1", nrows + 1);
        out.add_dim("nnz", data.size());
        out.add_dim("cells", ncells);
        out.add_var("row_ptr", nc3::NC_DOUBLE, {"rows_p1"}).data = row_ptr;
        out.add_var("col_ind", nc3::NC_DOUBLE, {"nnz"}).data = col_ind;
        out.add_var("data", nc3::NC_DOUBLE, {"nnz"}).data = data;
        auto &map_var = out.add_var("row_to_cell", nc3::NC_DOUBLE, {"rows"});
        for (int64_t r = 0; r < nrows; ++r)
            map_var.data[r] = static_cast<double>(row_to_cell[r]);
        nc3::write(matrix_fname, out);
        std::printf("gen_A: %lld rows, %zu nonzeros -> %s\n",
                    static_cast<long long>(nrows), data.size(),
                    matrix_fname.c_str());
        return 0;
    } catch (const std::exception &e) {
        std::fprintf(stderr, "gen_A: %s\n", e.what());
        return 1;
    }
}
