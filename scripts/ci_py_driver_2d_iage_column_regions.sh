#!/bin/bash
# CI: py_driver_2d iage with lateral transport disabled => per-column regions
# (exercises the multi-region solver path); full solve + step-log diff
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds
source scripts/ci_common.sh
ci_init py_driver_2d_iage_column_regions

cat > "$workdir/override.cfg" <<EOF
[modelinfo]
depth_nlevs = 20
ypos_nlevs = 3
max_abs_vvel = 0.0
horiz_mix_coeff = 0.0
EOF
input_dir=$(pwd)/input/py_driver_2d
cfg_fnames=$input_dir/newton_krylov.cfg,$input_dir/model_params.cfg,$workdir/override.cfg

run_step "running setup_solver.sh" \
    ./scripts/setup_solver.sh --fp_cnt 1 \
    --model_name py_driver_2d --tracer_module_names iage --persist \
    --cfg_fnames "$cfg_fnames" --workdir "$workdir" "$@"

cmp_nc "$workdir" grid_vars.nc
for fname in fcn_0000.nc hist_0000.nc init_iterate.nc init_iterate_0000.nc; do
    cmp_nc "$workdir/gen_init_iterate" $fname --atol 1.0e-6 --rtol 1.0e-3
done

run_step "running nk_driver.sh for py_driver_2d" "$workdir/nk_driver.sh"

cmp_nc "$workdir/krylov_00" precond_00.nc
cmp_nc "$workdir/krylov_00" precond_fcn_00.nc --rtol 2.0e-3
cmp_nc "$workdir/krylov_00" basis_00.nc --atol 5.0e-5
cmp_nc "$workdir/krylov_00" perturb_fcn_w_raw_00.nc --atol 5.0e-6
cmp_nc "$workdir/krylov_00" krylov_res_00.nc --rtol 1.9e-2
cmp_nc "$workdir" increment_00.nc --rtol 1.9e-2
cmp_nc "$workdir" iterate_01.nc --rtol 1.9e-2

diff_step_log
ci_exit
