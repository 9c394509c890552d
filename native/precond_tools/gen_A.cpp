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
 *   sink_type none | const RATE | const_shallow HOURS DEPTH_CM |
 *             file VAR         first-order sink: everywhere, above a depth,
 *                              or a spatially varying rate field [1/s] from
 *                              circ_fname
 *   pv VAR                     piston-velocity [cm/s] surface restoring from
 *                              tracer_fname (or circ_fname): surface-layer
 *                              sink at rate pv/dz_surf
 *   csr_fname FILE             add a precomputed CSR operator (row_ptr/
 *                              col_ind/data vars) -- external assemblies
 *   tracer_fname FILE          source of surface-flux derivative fields
 *   sf VAR                     surface-flux derivative d(SF)/d(tracer) from
 *                              tracer_fname applied to the surface layer
 *   adv_type upwind3|centered [UVAR VVAR WVAR]
 *                              lateral+vertical advection assembled from
 *                              face volume transports in circ_fname
 *                              (default var names UET, VNT, WTT)
 *   hmix_type file|isop_file [EVAR NVAR]
 *                              lateral diffusion from face conductances in
 *                              circ_fname (default HDIFF_E, HDIFF_N)
 *
 * Circulation-file conventions for the transport terms (the IRF mean file;
 * reference spec: docs/source/users-guide/tracer-module-defn-file.rst:70-105,
 * applied at nk_ooc/cime_pop/model_state.py:84-87).  Grid (nz, nlat, nlon),
 * zonally periodic:
 *   UET[k,j,i]  volume transport across the EAST face of cell (k,j,i)
 *               [cm^3/s], positive eastward; east of i=nlon-1 wraps to i=0
 *   VNT[k,j,i]  volume transport across the NORTH face [cm^3/s], positive
 *               northward; the north face of j=nlat-1 is closed
 *   WTT[k,j,i]  volume transport across the TOP face [cm^3/s], positive UP
 *               (POP convention); the surface face k=0 is closed
 *   HDIFF_E/N   diffusive conductances kappa*A/dx across the east/north
 *               faces [cm^3/s]
 *   TAREA[j,i]  cell horizontal area [cm^2]; with dz[k] [cm] gives volumes
 * Faces touching a masked (region<=0) cell carry no flux.  upwind3 uses the
 * 3rd-order upwind-biased face value (-T_uu + 5 T_up + 2 T_down)/6 and falls
 * back to 1st-order upwind where the far-upwind cell is masked or absent;
 * the assembly is in flux form, so volume-weighted column sums of the
 * advection+diffusion part vanish identically (tracer conservation) -- the
 * property tests/test_native.py pins.
 */

#include "nc3.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <algorithm>
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
    std::string adv_type = "none";
    std::string adv_uvar = "UET", adv_vvar = "VNT", adv_wvar = "WTT";
    std::string hmix_type = "none";
    std::string hmix_evar = "HDIFF_E", hmix_nvar = "HDIFF_N";
    std::string sink_type = "none", sink_var;
    double sink_rate = 0.0, sink_hours = 0.0, sink_depth_cm = 0.0;
    std::vector<std::string> sf_vars;
    std::vector<std::string> pv_vars;
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
        else if (key == "adv_type") {
            ss >> o.adv_type;
            std::string v;
            if (ss >> v) { o.adv_uvar = v; ss >> o.adv_vvar >> o.adv_wvar; }
        }
        else if (key == "hmix_type") {
            ss >> o.hmix_type;
            std::string v;
            if (ss >> v) { o.hmix_evar = v; ss >> o.hmix_nvar; }
        }
        else if (key == "sink_type") {
            ss >> o.sink_type;
            if (o.sink_type == "const") ss >> o.sink_rate;
            else if (o.sink_type == "const_shallow") ss >> o.sink_hours >> o.sink_depth_cm;
            else if (o.sink_type == "file") ss >> o.sink_var;
        } else if (key == "pv") {
            std::string var;
            ss >> var;
            o.pv_vars.push_back(var);
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

        /* lateral + vertical advection and lateral diffusion from face
         * transports/conductances in the circulation (IRF mean) file */
        if (opt.adv_type != "none" || opt.hmix_type != "none") {
            if (opt.circ_fname.empty())
                throw std::runtime_error(
                    "adv_type/hmix_type require circ_fname");
            if (mask->shape.size() != 3)
                throw std::runtime_error(
                    "adv_type/hmix_type require a 3D (nz, nlat, nlon) grid");
            const long lnz = static_cast<long>(mask->shape[0]);
            const long nlat = static_cast<long>(mask->shape[1]);
            const long nlon = static_cast<long>(mask->shape[2]);

            nc3::File circ = nc3::read(opt.circ_fname);
            const nc3::Var *tarea = circ.find("TAREA");
            const nc3::Var *dz = circ.find("dz");
            if (!tarea || !dz)
                throw std::runtime_error("circ file lacks TAREA/dz");

            /* cell volumes [cm^3] */
            auto volume = [&](long k, long j, long i) {
                return dz->data[static_cast<size_t>(k)] *
                       tarea->data[static_cast<size_t>(j * nlon + i)];
            };
            /* matrix row of cell (k, j, i); zonal wrap in i; -1 off-grid or
             * masked */
            auto row_at = [&](long k, long j, long i) -> int64_t {
                if (k < 0 || k >= lnz || j < 0 || j >= nlat) return -1;
                long ii = ((i % nlon) + nlon) % nlon;
                return cell_to_row[static_cast<size_t>(
                    (k * nlat + j) * nlon + ii)];
            };

            if (opt.adv_type != "none") {
                if (opt.adv_type != "upwind3" && opt.adv_type != "centered")
                    throw std::runtime_error(
                        "adv_type must be upwind3 or centered");
                const bool upwind3 = opt.adv_type == "upwind3";
                const nc3::Var *ut = circ.find(opt.adv_uvar);
                const nc3::Var *vt = circ.find(opt.adv_vvar);
                const nc3::Var *wt = circ.find(opt.adv_wvar);
                if (!ut || !vt || !wt)
                    throw std::runtime_error(
                        "circ file lacks " + opt.adv_uvar + "/" +
                        opt.adv_vvar + "/" + opt.adv_wvar);

                /* one face: transport trans from cell c to cell d (both
                 * in-grid); u = far-upwind behind c, dd = far-upwind beyond
                 * d.  The face tracer value's stencil weights become flux-
                 * form Jacobian entries on both rows. */
                auto add_face = [&](int64_t rc, int64_t rd, int64_t ru,
                                    int64_t rdd, double trans, double vol_c,
                                    double vol_d) {
                    if (rc < 0 || rd < 0 || trans == 0.0) return;
                    int64_t cols[3];
                    double wgts[3];
                    int ncoef;
                    if (!upwind3) {
                        cols[0] = rc; wgts[0] = 0.5;
                        cols[1] = rd; wgts[1] = 0.5;
                        ncoef = 2;
                    } else if (trans > 0.0) {
                        if (ru >= 0) {
                            cols[0] = ru; wgts[0] = -1.0 / 6.0;
                            cols[1] = rc; wgts[1] = 5.0 / 6.0;
                            cols[2] = rd; wgts[2] = 2.0 / 6.0;
                            ncoef = 3;
                        } else {
                            cols[0] = rc; wgts[0] = 1.0;
                            ncoef = 1;
                        }
                    } else {
                        if (rdd >= 0) {
                            cols[0] = rc; wgts[0] = 2.0 / 6.0;
                            cols[1] = rd; wgts[1] = 5.0 / 6.0;
                            cols[2] = rdd; wgts[2] = -1.0 / 6.0;
                            ncoef = 3;
                        } else {
                            cols[0] = rd; wgts[0] = 1.0;
                            ncoef = 1;
                        }
                    }
                    for (int p = 0; p < ncoef; ++p) {
                        trips.push_back(
                            {rc, cols[p], -delta_t * trans * wgts[p] / vol_c});
                        trips.push_back(
                            {rd, cols[p], delta_t * trans * wgts[p] / vol_d});
                    }
                };

                for (long k = 0; k < lnz; ++k)
                    for (long j = 0; j < nlat; ++j)
                        for (long i = 0; i < nlon; ++i) {
                            const size_t c =
                                static_cast<size_t>((k * nlat + j) * nlon + i);
                            /* east face: (k,j,i) -> (k,j,i+1), zonal wrap */
                            add_face(row_at(k, j, i), row_at(k, j, i + 1),
                                     row_at(k, j, i - 1), row_at(k, j, i + 2),
                                     ut->data[c], volume(k, j, i),
                                     volume(k, j, (i + 1) % nlon));
                            /* north face: (k,j,i) -> (k,j+1,i) */
                            if (j + 1 < nlat)
                                add_face(row_at(k, j, i), row_at(k, j + 1, i),
                                         row_at(k, j - 1, i),
                                         row_at(k, j + 2, i), vt->data[c],
                                         volume(k, j, i), volume(k, j + 1, i));
                            /* top face: (k,j,i) -> (k-1,j,i), positive up */
                            if (k >= 1)
                                add_face(row_at(k, j, i), row_at(k - 1, j, i),
                                         row_at(k + 1, j, i),
                                         row_at(k - 2, j, i), wt->data[c],
                                         volume(k, j, i), volume(k - 1, j, i));
                        }
            }

            if (opt.hmix_type != "none") {
                if (opt.hmix_type != "file" && opt.hmix_type != "isop_file")
                    throw std::runtime_error(
                        "hmix_type must be file or isop_file");
                const nc3::Var *ge = circ.find(opt.hmix_evar);
                const nc3::Var *gn = circ.find(opt.hmix_nvar);
                if (!ge || !gn)
                    throw std::runtime_error(
                        "circ file lacks " + opt.hmix_evar + "/" +
                        opt.hmix_nvar);

                auto add_diff = [&](int64_t rc, int64_t rd, double cond,
                                    double vol_c, double vol_d) {
                    if (rc < 0 || rd < 0 || cond == 0.0) return;
                    trips.push_back({rc, rd, delta_t * cond / vol_c});
                    trips.push_back({rc, rc, -delta_t * cond / vol_c});
                    trips.push_back({rd, rc, delta_t * cond / vol_d});
                    trips.push_back({rd, rd, -delta_t * cond / vol_d});
                };

                for (long k = 0; k < lnz; ++k)
                    for (long j = 0; j < nlat; ++j)
                        for (long i = 0; i < nlon; ++i) {
                            const size_t c =
                                static_cast<size_t>((k * nlat + j) * nlon + i);
                            add_diff(row_at(k, j, i), row_at(k, j, i + 1),
                                     ge->data[c], volume(k, j, i),
                                     volume(k, j, (i + 1) % nlon));
                            if (j + 1 < nlat)
                                add_diff(row_at(k, j, i), row_at(k, j + 1, i),
                                         gn->data[c], volume(k, j, i),
                                         volume(k, j + 1, i));
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
        } else if (opt.sink_type == "file") {
            /* spatially varying first-order decay rate [1/s] from the
             * circulation file (reference spec: docs/source/users-guide/
             * tracer-module-defn-file.rst sink_type file) */
            if (opt.circ_fname.empty())
                throw std::runtime_error("sink_type file requires circ_fname");
            nc3::File circ = nc3::read(opt.circ_fname);
            const nc3::Var *rate_var = circ.find(opt.sink_var);
            if (!rate_var)
                throw std::runtime_error(
                    "circ file lacks sink field " + opt.sink_var);
            if (rate_var->size() != ncells)
                throw std::runtime_error(
                    "sink field " + opt.sink_var + " has " +
                    std::to_string(rate_var->size()) + " cells, grid has " +
                    std::to_string(ncells));
            for (size_t c = 0; c < ncells; ++c) {
                int64_t r = cell_to_row[c];
                double rate = rate_var->data[c];
                if (r >= 0 && std::abs(rate) < 1.0e30)
                    trips.push_back({r, r, -delta_t * rate});
            }
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

        /* piston-velocity surface restoring: pv [cm/s] from tracer_fname
         * (or circ_fname) acts as a first-order surface-layer sink at rate
         * pv / dz_surf (reference spec: tracer-module-defn-file.rst pv) */
        if (!opt.pv_vars.empty()) {
            /* the field may live in either file; search both so a pv var
             * stored in the circulation file is not silently dropped */
            std::vector<nc3::File> srcs;
            if (!opt.tracer_fname.empty()) srcs.push_back(nc3::read(opt.tracer_fname));
            if (!opt.circ_fname.empty()) srcs.push_back(nc3::read(opt.circ_fname));
            if (srcs.empty())
                throw std::runtime_error("pv requires tracer_fname or circ_fname");
            double dz_surf_cm = 1.0e2;
            for (auto &f : srcs)
                if (const nc3::Var *dz = f.find("dz")) {
                    dz_surf_cm = dz->data[0];
                    break;
                }
            for (auto &pv_var : opt.pv_vars) {
                const nc3::Var *pv = nullptr;
                for (auto &f : srcs)
                    if ((pv = f.find(pv_var)) != nullptr) break;
                if (!pv)
                    throw std::runtime_error(
                        "pv field " + pv_var + " found in neither "
                        "tracer_fname nor circ_fname");
                if (pv->size() != nhoriz)
                    throw std::runtime_error(
                        "pv field " + pv_var + " has " +
                        std::to_string(pv->size()) + " cells, surface has " +
                        std::to_string(nhoriz));
                for (size_t h = 0; h < nhoriz; ++h) {
                    int64_t r = cell_to_row[h];
                    if (r < 0) continue;
                    double val = pv->data[h];
                    if (!(std::abs(val) < 1.0e30)) continue; /* fill/NaN */
                    trips.push_back({r, r, -delta_t * val / dz_surf_cm});
                }
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

        /* triplets -> CSR (accumulate duplicates): stable-sort by
         * (row, col) then merge runs.  The per-row std::map variant
         * allocated ~10 tree nodes per row and went superlinear from
         * allocator/cache thrash at gx1 scale (3M rows: 172 s vs 8.5 s
         * for half the rows); the sort works in contiguous memory and
         * the stable order keeps duplicate summation in insertion
         * order, bit-identical to the map accumulation. */
        std::stable_sort(trips.begin(), trips.end(),
                         [](const Triplet &a, const Triplet &b) {
                             return a.row != b.row ? a.row < b.row
                                                  : a.col < b.col;
                         });
        std::vector<double> row_ptr(nrows + 1, 0.0), col_ind, data;
        col_ind.reserve(trips.size());
        data.reserve(trips.size());
        size_t ti = 0;
        for (int64_t r = 0; r < nrows; ++r) {
            while (ti < trips.size() && trips[ti].row == r) {
                int64_t c = trips[ti].col;
                double v = 0.0;
                while (ti < trips.size() && trips[ti].row == r &&
                       trips[ti].col == c) {
                    v += trips[ti].val;
                    ++ti;
                }
                col_ind.push_back(static_cast<double>(c));
                data.push_back(v);
            }
            row_ptr[r + 1] = static_cast<double>(data.size());
        }

        nc3::File out;
        out.text_gatts["history"] = "created by native gen_A";
        out.add_dim("rows", nrows);
        out.add_dim("rows_p1", nrows + 1);
        out.add_dim("nnz", data.size());
        out.add_dim("cells", ncells);
        /* grid decomposition of the flat cell index (cell = k*nhoriz + h):
         * lets the device solver regroup rows into vertical lines for the
         * column-tridiagonal preconditioner without re-reading the grid */
        out.add_dim("grid_nz", nz);
        out.add_dim("grid_nhoriz", nhoriz);
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
