#!/bin/bash
# long CI: full Newton solve of test_problem iage vs golden baselines + step log
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds
source scripts/ci_common.sh
ci_init long_iage

run_step "running setup_solver.sh for iage" \
    ./scripts/setup_solver.sh --fp_cnt 1 --depth_nlevs 20 --persist \
    --tracer_module_names iage --workdir "$workdir" "$@"

run_step "running nk_driver.sh for iage" "$workdir/nk_driver.sh"

for fname in precond_00.nc precond_fcn_00.nc basis_00.nc perturb_fcn_w_raw_00.nc; do
    cmp_nc "$workdir/krylov_00" $fname
done
for fname in w_raw_00.nc w_00.nc krylov_res_00.nc; do
    cmp_nc "$workdir/krylov_00" $fname --rtol 2.0e-4
done
for fname in increment_00.nc iterate_01.nc; do
    cmp_nc "$workdir" $fname --rtol 2.0e-4
done

diff_step_log
ci_exit
