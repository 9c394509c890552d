"""tests for the native C++ components: gcol coloring (library + CLI),
precond tools (gen_A / solve_ABdist with the C++ netCDF-3 codec), and
coloring-based Jacobian probing"""

import os
import subprocess

import numpy as np
import pytest

from newton_krylov_ooc_tpu.ops.probing import (
    build_distance2_graph,
    color_graph,
    probe_jacobian,
)
from newton_krylov_ooc_tpu.utils.ncio import NCFile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
NATIVE = os.path.join(REPO_ROOT, "native")
GCOL_CLI = os.path.join(NATIVE, "build", "gcol")
GEN_A = os.path.join(NATIVE, "precond_tools", "bin", "gen_A")
SOLVE = os.path.join(NATIVE, "precond_tools", "bin", "solve_ABdist")

needs_native = pytest.mark.skipif(
    not os.path.exists(GCOL_CLI), reason="native components not built"
)


def _ring_graph(n):
    """cycle graph C_n as CSR"""
    row_ptr = np.arange(0, 2 * n + 1, 2, dtype=np.int64)
    col_ind = np.empty(2 * n, dtype=np.int32)
    for v in range(n):
        col_ind[2 * v] = (v - 1) % n
        col_ind[2 * v + 1] = (v + 1) % n
    return row_ptr, col_ind


def _assert_proper(row_ptr, col_ind, colors):
    for v in range(len(row_ptr) - 1):
        for u in col_ind[row_ptr[v] : row_ptr[v + 1]]:
            assert colors[v] != colors[u]


@needs_native
@pytest.mark.parametrize(
    "algorithm",
    ["greedy", "dsatur", "rlf", "backtracking", "hybrid_ea", "hillclimber",
     "antcol"],
)
def test_gcol_algorithms_ring(algorithm):
    """even rings are 2-chromatic, odd rings 3-chromatic"""
    for n, chromatic in [(10, 2), (11, 3)]:
        row_ptr, col_ind = _ring_graph(n)
        n_colors, colors = color_graph(row_ptr, col_ind, algorithm=algorithm)
        _assert_proper(row_ptr, col_ind, colors)
        assert n_colors >= chromatic
        if algorithm in ("backtracking", "hybrid_ea", "hillclimber",
                         "antcol"):
            assert n_colors == chromatic  # these reach the optimum here


@needs_native
def test_gcol_tabucol():
    row_ptr, col_ind = _ring_graph(12)
    lib_colors = color_graph(row_ptr, col_ind, algorithm="hybrid_ea")
    assert lib_colors[0] == 2


@needs_native
@pytest.mark.parametrize("algorithm", ["tabucol", "partialcol"])
def test_gcol_fixed_k_searches(algorithm):
    """the fixed-k searches find a proper 2-coloring of an even ring and
    require target_k"""
    row_ptr, col_ind = _ring_graph(14)
    n_colors, colors = color_graph(
        row_ptr, col_ind, algorithm=algorithm, target_k=2
    )
    assert n_colors == 2
    _assert_proper(row_ptr, col_ind, colors)
    with pytest.raises(ValueError, match="target_k"):
        color_graph(row_ptr, col_ind, algorithm=algorithm)
    with pytest.raises(ValueError, match="target_k"):
        color_graph(row_ptr, col_ind, algorithm=algorithm, target_k=0)
    # an odd ring has no proper 2-coloring: the search must report failure
    row_ptr, col_ind = _ring_graph(9)
    with pytest.raises(RuntimeError):
        color_graph(
            row_ptr, col_ind, algorithm=algorithm, target_k=2,
            max_iters=2000,
        )


@needs_native
def test_gcol_metaheuristics_random_graph():
    """on a G(40, 0.3) graph every algorithm is proper and the k-reducing
    metaheuristics never do worse than their DSatur start"""
    rng = np.random.default_rng(3)
    n = 40
    adj = np.triu(rng.random((n, n)) < 0.3, k=1)
    adj = adj | adj.T
    row_ptr = np.zeros(n + 1, dtype=np.int64)
    row_ptr[1:] = np.cumsum(adj.sum(axis=1))
    col_ind = np.concatenate(
        [np.nonzero(adj[v])[0] for v in range(n)]
    ).astype(np.int32)
    k_dsatur, _ = color_graph(row_ptr, col_ind, algorithm="dsatur")
    for algorithm in ("rlf", "hillclimber", "hybrid_ea", "antcol"):
        n_colors, colors = color_graph(
            row_ptr, col_ind, algorithm=algorithm, max_iters=20_000
        )
        _assert_proper(row_ptr, col_ind, colors)
        if algorithm != "rlf":
            assert n_colors <= k_dsatur


def test_python_fallback_dsatur(monkeypatch):
    """the pure-python DSatur fallback produces a proper coloring"""
    import newton_krylov_ooc_tpu.ops.probing as probing

    monkeypatch.setattr(probing, "_GCOL_LIB", None)
    monkeypatch.setattr(probing, "_GCOL_CHECKED", True)
    row_ptr, col_ind = _ring_graph(9)
    n_colors, colors = probing.color_graph(row_ptr, col_ind)
    _assert_proper(row_ptr, col_ind, colors)
    assert n_colors <= 3


@needs_native
def test_gcol_cli_dimacs(tmp_path):
    """the CLI reads DIMACS and writes a proper solution file"""
    # Petersen graph: chromatic number 3
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 1),
        (6, 8), (8, 10), (10, 7), (7, 9), (9, 6),
        (1, 6), (2, 7), (3, 8), (4, 9), (5, 10),
    ]
    dimacs = tmp_path / "petersen.col"
    with open(dimacs, "w") as fptr:
        fptr.write(f"p edge 10 {len(edges)}\n")
        for u, v in edges:
            fptr.write(f"e {u} {v}\n")
    sol = tmp_path / "solution.txt"
    subprocess.run(
        [GCOL_CLI, "hybrid_ea", str(dimacs), "-o", str(sol)],
        check=True,
        cwd=tmp_path,
    )
    lines = sol.read_text().split()
    n_colors = int(lines[0])
    colors = np.array([int(x) for x in lines[1:]])
    assert n_colors == 3
    for u, v in edges:
        assert colors[u - 1] != colors[v - 1]


def test_probe_jacobian_exact():
    """coloring-based probing recovers a banded Jacobian exactly"""
    rng = np.random.default_rng(7)
    n = 30
    jac = np.zeros((n, n))
    for off in (-1, 0, 1):
        idx = np.arange(max(0, -off), min(n, n - off))
        jac[idx, idx + off] = rng.normal(size=len(idx))
    sparsity = jac != 0

    recovered, n_colors = probe_jacobian(lambda v: jac @ v, sparsity)
    assert n_colors <= 3  # tridiagonal: 3 structurally-orthogonal groups
    assert np.allclose(recovered, jac)


@needs_native
def test_gen_a_solve_abdist_roundtrip(tmp_path):
    """native gen_A assembles A = dt*J - I (vertical mixing + sink) and
    solve_ABdist solves it; verified against a dense numpy solve"""
    nz, nlat, nlon = 4, 2, 3
    ncells = nz * nlat * nlon

    # grid/region file (all cells active)
    reg_fname = tmp_path / "grid_vars.nc"
    with NCFile(str(reg_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        mask = fptr.create_variable("region_mask", "i4", ("z_t", "nlat", "nlon"))
        mask[:] = np.ones((nz, nlat, nlon), np.int32)

    # circulation file: dz (cm) and interface diffusivity (cm^2/s)
    circ_fname = tmp_path / "irf.nc"
    with NCFile(str(circ_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        fptr.create_variable("dz", "f8", ("z_t",))[:] = np.full(nz, 100.0e2)
        vdc = fptr.create_variable("VDC", "f8", ("z_t", "nlat", "nlon"))
        vdc[:] = np.full((nz, nlat, nlon), 1.0e4)  # 1 m^2/s in cm^2/s

    opts = tmp_path / "matrix.opts"
    opts.write_text(
        "day_cnt 365\n"
        f"reg_fname {reg_fname}\n"
        f"circ_fname {circ_fname}\n"
        "vmix_type file VDC\n"
        "sink_type const 1.0e-8\n"
    )
    matrix_fname = tmp_path / "matrix.nc"
    subprocess.run(
        [GEN_A, "-D1", "-o", str(opts), str(matrix_fname)], check=True
    )

    # read the assembled CSR back through the python netCDF layer
    with NCFile(str(matrix_fname)) as fptr:
        row_ptr = fptr.var("row_ptr")[:].astype(np.int64)
        col_ind = fptr.var("col_ind")[:].astype(np.int64)
        data = fptr.var("data")[:]
        row_to_cell = fptr.var("row_to_cell")[:].astype(np.int64)
    n = len(row_ptr) - 1
    assert n == ncells
    a_dense = np.zeros((n, n))
    for r in range(n):
        for p in range(int(row_ptr[r]), int(row_ptr[r + 1])):
            a_dense[r, int(col_ind[p])] = data[p]
    # diagonal must include the -I term
    assert (np.diag(a_dense) < 0).all()

    # state file with a tracer to solve for
    state_fname = tmp_path / "state.nc"
    rng = np.random.default_rng(3)
    rhs = rng.normal(size=(nz, nlat, nlon))
    with NCFile(str(state_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        for suffix in ["CUR", "OLD"]:
            var = fptr.create_variable(f"IAGE_{suffix}", "f8", ("z_t", "nlat", "nlon"))
            var[:] = rhs

    subprocess.run(
        [SOLVE, "-D1", "-n", "2,2", "-v", "IAGE_CUR", str(matrix_fname),
         str(state_fname)],
        check=True,
    )

    with NCFile(str(state_fname)) as fptr:
        solution = fptr.var("IAGE_CUR")[:].reshape(-1)
        old = fptr.var("IAGE_OLD")[:].reshape(-1)

    expected = np.linalg.solve(a_dense, rhs.reshape(-1)[row_to_cell])
    assert np.allclose(solution[row_to_cell], expected, rtol=1e-9, atol=1e-12)
    assert np.array_equal(solution, old)


def test_device_sparse_solve_matches_native(tmp_path):
    """the on-device ELL/BiCGSTAB path (ops/sparse + cime_pop
    precond_solver_mode=device) solves the same gen_A matrix to the same
    answer as the native solve_ABdist tool"""
    if not os.path.exists(GEN_A):
        pytest.skip("native tools not built")
    from newton_krylov_ooc_tpu.models.cime_pop.model_state import (
        _device_solve_matrix,
    )
    from newton_krylov_ooc_tpu.ops.sparse import solve_csr_systems

    nz, nlat, nlon = 5, 3, 2
    reg_fname = tmp_path / "grid_vars.nc"
    with NCFile(str(reg_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        mask = fptr.create_variable("region_mask", "i4", ("z_t", "nlat", "nlon"))
        mask[:] = np.ones((nz, nlat, nlon), np.int32)
    circ_fname = tmp_path / "irf.nc"
    with NCFile(str(circ_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        fptr.create_variable("dz", "f8", ("z_t",))[:] = np.full(nz, 100.0e2)
        vdc = fptr.create_variable("VDC", "f8", ("z_t", "nlat", "nlon"))
        vdc[:] = np.full((nz, nlat, nlon), 1.0e4)
    opts = tmp_path / "matrix.opts"
    opts.write_text(
        "day_cnt 365\n"
        f"reg_fname {reg_fname}\n"
        f"circ_fname {circ_fname}\n"
        "vmix_type file VDC\n"
        "sink_type const 1.0e-8\n"
    )
    matrix_fname = tmp_path / "matrix.nc"
    subprocess.run([GEN_A, "-D1", "-o", str(opts), str(matrix_fname)], check=True)

    rng = np.random.default_rng(7)
    rhs = rng.normal(size=(nz, nlat, nlon))
    state_fname = tmp_path / "state.nc"
    with NCFile(str(state_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        for suffix in ["CUR", "OLD"]:
            var = fptr.create_variable(
                f"IAGE_{suffix}", "f8", ("z_t", "nlat", "nlon")
            )
            var[:] = rhs

    _device_solve_matrix(str(matrix_fname), str(state_fname), ["IAGE_CUR"])

    with NCFile(str(matrix_fname)) as fptr:
        row_ptr = fptr.var("row_ptr")[:].astype(np.int64)
        col_ind = fptr.var("col_ind")[:].astype(np.int64)
        data = fptr.var("data")[:]
        row_to_cell = fptr.var("row_to_cell")[:].astype(np.int64)
    n = len(row_ptr) - 1
    a_dense = np.zeros((n, n))
    for r in range(n):
        for p in range(int(row_ptr[r]), int(row_ptr[r + 1])):
            a_dense[r, int(col_ind[p])] = data[p]
    expected = np.linalg.solve(a_dense, rhs.reshape(-1)[row_to_cell])

    with NCFile(str(state_fname)) as fptr:
        solution = fptr.var("IAGE_CUR")[:].reshape(-1)
        old = fptr.var("IAGE_OLD")[:].reshape(-1)
    assert np.allclose(solution[row_to_cell], expected, rtol=1e-8, atol=1e-11)
    assert np.array_equal(solution, old)

    # direct batched-API check with 2 right-hand sides
    rhs2 = rng.normal(size=(2, n))
    x, ok = solve_csr_systems(row_ptr, col_ind, data, rhs2)
    assert ok.all()
    assert np.allclose(
        x, np.linalg.solve(a_dense, rhs2.T).T, rtol=1e-8, atol=1e-11
    )

    # the precond_solver_mode=device_mixed path (f32 inner iterations under
    # f64 refinement) reaches the same answer through the file interface
    state2_fname = tmp_path / "state_mixed.nc"
    with NCFile(str(state2_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        var = fptr.create_variable("IAGE_CUR", "f8", ("z_t", "nlat", "nlon"))
        var[:] = rhs
    _device_solve_matrix(
        str(matrix_fname), str(state2_fname), ["IAGE_CUR"],
        mixed_precision=True,
    )
    with NCFile(str(state2_fname)) as fptr:
        sol_mixed = fptr.var("IAGE_CUR")[:].reshape(-1)
    assert np.allclose(
        sol_mixed[row_to_cell], expected, rtol=1e-8, atol=1e-11
    )


def _assemble_transport_reference(mask, dz, tarea, uet, vnt, wtt, hde, hdn,
                                  delta_t, upwind3=True):
    """independent numpy assembly of the documented gen_A transport spec:
    flux-form upwind3 advection + lateral diffusion, zonal wrap, first-order
    fallback at masked/absent far-upwind cells (native/precond_tools/
    gen_A.cpp header comment)"""
    nz, nlat, nlon = mask.shape
    cell_to_row = -np.ones(mask.size, np.int64)
    row_to_cell = np.nonzero(mask.reshape(-1) > 0)[0]
    cell_to_row[row_to_cell] = np.arange(len(row_to_cell))
    n = len(row_to_cell)
    jac = np.zeros((n, n))

    def row(k, j, i):
        if k < 0 or k >= nz or j < 0 or j >= nlat:
            return -1
        return cell_to_row[(k * nlat + j) * nlon + i % nlon]

    def vol(k, j, i):
        return dz[k] * tarea[j, i % nlon]

    def face(rc, rd, ru, rdd, trans, vc, vd):
        if rc < 0 or rd < 0 or trans == 0.0:
            return
        if not upwind3:
            coefs = [(rc, 0.5), (rd, 0.5)]
        elif trans > 0:
            coefs = (
                [(ru, -1 / 6), (rc, 5 / 6), (rd, 2 / 6)]
                if ru >= 0
                else [(rc, 1.0)]
            )
        else:
            coefs = (
                [(rc, 2 / 6), (rd, 5 / 6), (rdd, -1 / 6)]
                if rdd >= 0
                else [(rd, 1.0)]
            )
        for col, w in coefs:
            jac[rc, col] -= delta_t * trans * w / vc
            jac[rd, col] += delta_t * trans * w / vd

    def diff(rc, rd, cond, vc, vd):
        if rc < 0 or rd < 0 or cond == 0.0:
            return
        jac[rc, rd] += delta_t * cond / vc
        jac[rc, rc] -= delta_t * cond / vc
        jac[rd, rc] += delta_t * cond / vd
        jac[rd, rd] -= delta_t * cond / vd

    for k in range(nz):
        for j in range(nlat):
            for i in range(nlon):
                c = (k, j, i)
                face(row(*c), row(k, j, i + 1), row(k, j, i - 1),
                     row(k, j, i + 2), uet[c], vol(*c), vol(k, j, i + 1))
                if j + 1 < nlat:
                    face(row(*c), row(k, j + 1, i), row(k, j - 1, i),
                         row(k, j + 2, i), vnt[c], vol(*c), vol(k, j + 1, i))
                if k >= 1:
                    face(row(*c), row(k - 1, j, i), row(k + 1, j, i),
                         row(k - 2, j, i), wtt[c], vol(*c), vol(k - 1, j, i))
                diff(row(*c), row(k, j, i + 1), hde[c], vol(*c),
                     vol(k, j, i + 1))
                if j + 1 < nlat:
                    diff(row(*c), row(k, j + 1, i), hdn[c], vol(*c),
                         vol(k, j + 1, i))
    return jac, row_to_cell


@needs_native
def test_gen_a_transport_assembly(tmp_path):
    """gen_A's upwind3 advection + hmix assembly from a synthetic IRF file
    matches the independent numpy spec, conserves volume-weighted tracer,
    and solves to the same answer through solve_ABdist and the device path"""
    nz, nlat, nlon = 4, 5, 6
    rng = np.random.default_rng(11)
    mask = np.ones((nz, nlat, nlon), np.int32)
    mask[2:, 1, 2] = 0  # a seamount of masked cells
    mask[:, 3, 4] = 0   # a full masked column
    dz = rng.uniform(50.0e2, 200.0e2, nz)
    tarea = rng.uniform(0.8e14, 1.2e14, (nlat, nlon))
    uet = rng.normal(0.0, 1.0e12, (nz, nlat, nlon))
    vnt = rng.normal(0.0, 1.0e12, (nz, nlat, nlon))
    wtt = rng.normal(0.0, 1.0e11, (nz, nlat, nlon))
    hde = rng.uniform(0.0, 1.0e12, (nz, nlat, nlon))
    hdn = rng.uniform(0.0, 1.0e12, (nz, nlat, nlon))
    day_cnt = 365.0
    delta_t = day_cnt * 86400.0

    reg_fname = tmp_path / "grid_vars.nc"
    with NCFile(str(reg_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        var = fptr.create_variable("region_mask", "i4", ("z_t", "nlat", "nlon"))
        var[:] = mask

    circ_fname = tmp_path / "irf.nc"
    with NCFile(str(circ_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        fptr.create_variable("dz", "f8", ("z_t",))[:] = dz
        fptr.create_variable("TAREA", "f8", ("nlat", "nlon"))[:] = tarea
        for name, vals in [("UET", uet), ("VNT", vnt), ("WTT", wtt),
                           ("HDIFF_E", hde), ("HDIFF_N", hdn)]:
            fptr.create_variable(name, "f8", ("z_t", "nlat", "nlon"))[:] = vals

    opts = tmp_path / "matrix.opts"
    opts.write_text(
        f"day_cnt {day_cnt}\n"
        f"reg_fname {reg_fname}\n"
        f"circ_fname {circ_fname}\n"
        "adv_type upwind3\n"
        "hmix_type isop_file\n"
    )
    matrix_fname = tmp_path / "matrix.nc"
    subprocess.run(
        [GEN_A, "-D1", "-o", str(opts), str(matrix_fname)], check=True
    )

    with NCFile(str(matrix_fname)) as fptr:
        row_ptr = fptr.var("row_ptr")[:].astype(np.int64)
        col_ind = fptr.var("col_ind")[:].astype(np.int64)
        data = fptr.var("data")[:]
        row_to_cell = fptr.var("row_to_cell")[:].astype(np.int64)
    n = len(row_ptr) - 1
    a_dense = np.zeros((n, n))
    for r in range(n):
        for p in range(int(row_ptr[r]), int(row_ptr[r + 1])):
            a_dense[r, int(col_ind[p])] = data[p]

    jac_ref, r2c_ref = _assemble_transport_reference(
        mask, dz, tarea, uet, vnt, wtt, hde, hdn, delta_t
    )
    assert np.array_equal(row_to_cell, r2c_ref)
    a_ref = jac_ref - np.eye(n)  # A = delta_t * J - I
    scale = np.abs(a_ref).max()
    assert np.abs(a_dense - a_ref).max() < 1e-12 * scale

    # flux form conserves tracer: volume-weighted column sums of the
    # transport part (A + I) vanish identically
    vols = np.empty(n)
    for r, c in enumerate(row_to_cell):
        k, rem = divmod(int(c), nlat * nlon)
        j, i = divmod(rem, nlon)
        vols[r] = dz[k] * tarea[j, i]
    colsums = vols @ (a_dense + np.eye(n))
    assert np.abs(colsums).max() < 1e-12 * np.abs(vols @ a_dense).max()

    # both solver paths agree with the dense solve
    rhs = rng.normal(size=(nz, nlat, nlon))
    expected = np.linalg.solve(a_dense, rhs.reshape(-1)[row_to_cell])
    for solver in ["native", "device"]:
        state_fname = tmp_path / f"state_{solver}.nc"
        with NCFile(str(state_fname), mode="w") as fptr:
            fptr.create_dimensions_verify(
                {"z_t": nz, "nlat": nlat, "nlon": nlon}
            )
            var = fptr.create_variable(
                "IAGE_CUR", "f8", ("z_t", "nlat", "nlon")
            )
            var[:] = rhs
        if solver == "native":
            subprocess.run(
                [SOLVE, "-D1", "-n", "2,2", "-v", "IAGE_CUR",
                 str(matrix_fname), str(state_fname)],
                check=True,
            )
        else:
            from newton_krylov_ooc_tpu.models.cime_pop.model_state import (
                _device_solve_matrix,
            )

            _device_solve_matrix(
                str(matrix_fname), str(state_fname), ["IAGE_CUR"]
            )
        with NCFile(str(state_fname)) as fptr:
            solution = fptr.var("IAGE_CUR")[:].reshape(-1)
        assert np.allclose(
            solution[row_to_cell], expected, rtol=1e-7, atol=1e-10
        ), solver


@needs_native
def test_gen_a_pv_and_sink_file_options(tmp_path):
    """the piston-velocity (pv) and spatially-varying-sink (sink_type file)
    options assemble the documented diagonal terms"""
    nz, nlat, nlon = 3, 2, 2
    nhoriz = nlat * nlon
    ncells = nz * nhoriz
    rng = np.random.default_rng(5)
    dz = np.array([50.0e2, 100.0e2, 200.0e2])
    pv_field = rng.uniform(1.0e-3, 5.0e-3, (nlat, nlon))
    sink_field = rng.uniform(0.0, 1.0e-8, (nz, nlat, nlon))
    day_cnt = 10.0
    delta_t = day_cnt * 86400.0

    reg_fname = tmp_path / "grid_vars.nc"
    with NCFile(str(reg_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        var = fptr.create_variable("region_mask", "i4", ("z_t", "nlat", "nlon"))
        var[:] = np.ones((nz, nlat, nlon), np.int32)

    circ_fname = tmp_path / "irf.nc"
    with NCFile(str(circ_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        fptr.create_variable("dz", "f8", ("z_t",))[:] = dz
        fptr.create_variable("PV_TR", "f8", ("nlat", "nlon"))[:] = pv_field
        fptr.create_variable(
            "SINK_TR", "f8", ("z_t", "nlat", "nlon")
        )[:] = sink_field

    opts = tmp_path / "matrix.opts"
    opts.write_text(
        f"day_cnt {day_cnt}\n"
        f"reg_fname {reg_fname}\n"
        f"circ_fname {circ_fname}\n"
        "sink_type file SINK_TR\n"
        "pv PV_TR\n"
    )
    matrix_fname = tmp_path / "matrix.nc"
    subprocess.run(
        [GEN_A, "-D1", "-o", str(opts), str(matrix_fname)], check=True
    )

    with NCFile(str(matrix_fname)) as fptr:
        row_ptr = fptr.var("row_ptr")[:].astype(np.int64)
        col_ind = fptr.var("col_ind")[:].astype(np.int64)
        data = fptr.var("data")[:]
    n = len(row_ptr) - 1
    assert n == ncells
    a_dense = np.zeros((n, n))
    for r in range(n):
        for ptr in range(int(row_ptr[r]), int(row_ptr[r + 1])):
            a_dense[r, int(col_ind[ptr])] = data[ptr]

    # expected: pure diagonal, A = dt*J - I with
    # J = -sink_rate everywhere, minus pv/dz_surf in the surface layer
    expected = -delta_t * sink_field.reshape(-1) - 1.0
    expected[:nhoriz] -= delta_t * pv_field.reshape(-1) / dz[0]
    assert np.allclose(np.diag(a_dense), expected, rtol=1e-12)
    assert np.allclose(a_dense - np.diag(np.diag(a_dense)), 0.0)


@needs_native
def test_column_line_preconditioner(tmp_path):
    """vertical-line (column tridiagonal) preconditioning: the extracted
    lines match the dense matrix, the solve agrees with Jacobi-BiCGSTAB, and
    on a vmix-stiff transport matrix it needs far fewer iterations"""
    from newton_krylov_ooc_tpu.ops.sparse import (
        column_tridiag_from_csr,
        line_precond_apply,
        solve_csr_systems,
    )

    nz, nlat, nlon = 6, 4, 5
    nhoriz = nlat * nlon
    rng = np.random.default_rng(23)
    mask = np.ones((nz, nlat, nlon), np.int32)
    mask[3:, 2, 1] = 0  # seamount: columns of unequal active depth
    mask[:, 0, 3] = 0   # fully masked column
    dz = rng.uniform(25.0e2, 50.0e2, nz)  # thin layers -> stiff vmix
    tarea = rng.uniform(0.8e14, 1.2e14, (nlat, nlon))
    uet = rng.normal(0.0, 1.0e12, (nz, nlat, nlon))
    vnt = rng.normal(0.0, 1.0e12, (nz, nlat, nlon))
    wtt = rng.normal(0.0, 1.0e11, (nz, nlat, nlon))
    hde = rng.uniform(0.0, 1.0e12, (nz, nlat, nlon))
    hdn = rng.uniform(0.0, 1.0e12, (nz, nlat, nlon))

    reg_fname = tmp_path / "grid_vars.nc"
    with NCFile(str(reg_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        var = fptr.create_variable("region_mask", "i4", ("z_t", "nlat", "nlon"))
        var[:] = mask

    circ_fname = tmp_path / "irf.nc"
    with NCFile(str(circ_fname), mode="w") as fptr:
        fptr.create_dimensions_verify({"z_t": nz, "nlat": nlat, "nlon": nlon})
        fptr.create_variable("dz", "f8", ("z_t",))[:] = dz
        fptr.create_variable("TAREA", "f8", ("nlat", "nlon"))[:] = tarea
        vdc = fptr.create_variable("VDC", "f8", ("z_t", "nlat", "nlon"))
        vdc[:] = np.full((nz, nlat, nlon), 5.0e4)  # strong mixing
        for name, vals in [("UET", uet), ("VNT", vnt), ("WTT", wtt),
                           ("HDIFF_E", hde), ("HDIFF_N", hdn)]:
            fptr.create_variable(name, "f8", ("z_t", "nlat", "nlon"))[:] = vals

    opts = tmp_path / "matrix.opts"
    opts.write_text(
        "day_cnt 365\n"
        f"reg_fname {reg_fname}\n"
        f"circ_fname {circ_fname}\n"
        "vmix_type file VDC\n"
        "adv_type upwind3\n"
        "hmix_type isop_file\n"
        "sink_type const 1.0e-9\n"
    )
    matrix_fname = tmp_path / "matrix.nc"
    subprocess.run([GEN_A, "-D1", "-o", str(opts), str(matrix_fname)],
                   check=True)

    with NCFile(str(matrix_fname)) as fptr:
        # gen_A records the grid decomposition of the flat cell index
        assert fptr.dimensions["grid_nz"] == nz
        assert fptr.dimensions["grid_nhoriz"] == nhoriz
        row_ptr = fptr.var("row_ptr")[:].astype(np.int64)
        col_ind = fptr.var("col_ind")[:].astype(np.int64)
        data = fptr.var("data")[:]
        row_to_cell = fptr.var("row_to_cell")[:].astype(np.int64)
    n = len(row_ptr) - 1
    a_dense = np.zeros((n, n))
    for r in range(n):
        for p in range(int(row_ptr[r]), int(row_ptr[r + 1])):
            a_dense[r, int(col_ind[p])] = data[p]

    # the extracted lines reproduce exactly the diagonal + vertical-neighbor
    # entries of the matrix: applying the preconditioner to (line part) @ x
    # returns x
    dl, d, du, slot = column_tridiag_from_csr(
        row_ptr, col_ind, data, row_to_cell, nhoriz
    )
    line_dense = np.zeros((n, n))
    k_of_row = row_to_cell // nhoriz
    h_of_row = row_to_cell % nhoriz
    for r in range(n):
        for c in range(n):
            if h_of_row[c] == h_of_row[r] and abs(k_of_row[c] - k_of_row[r]) <= 1:
                line_dense[r, c] = a_dense[r, c]
    x_ref = rng.normal(size=n)
    applied = np.asarray(
        line_precond_apply(dl, d, du, slot, line_dense @ x_ref)
    )
    assert np.allclose(applied, x_ref, rtol=1e-10, atol=1e-12)

    # both preconditioners reach the same answer; the line solve in far
    # fewer iterations on this vmix-stiff matrix
    rhs = rng.normal(size=(2, n))
    expected = np.linalg.solve(a_dense, rhs.T).T
    x_j, ok_j, it_j = solve_csr_systems(
        row_ptr, col_ind, data, rhs, return_iters=True
    )
    x_l, ok_l, it_l = solve_csr_systems(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz,
        return_iters=True,
    )
    assert ok_j.all() and ok_l.all()
    assert np.allclose(x_j, expected, rtol=1e-7, atol=1e-10)
    assert np.allclose(x_l, expected, rtol=1e-7, atol=1e-10)
    assert it_l.max() * 2 <= it_j.max(), (it_l, it_j)
