#!/bin/bash
# CI: py_driver_2d iage setup (30x30 grid) vs golden baselines
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds
source scripts/ci_common.sh
ci_init py_driver_2d_iage

cat > "$workdir/override.cfg" <<EOF
[modelinfo]
depth_nlevs = 30
ypos_nlevs = 30
EOF
input_dir=$(pwd)/input/py_driver_2d
cfg_fnames=$input_dir/newton_krylov.cfg,$input_dir/model_params.cfg,$workdir/override.cfg

run_step "running setup_solver.sh" \
    ./scripts/setup_solver.sh --fp_cnt 1 \
    --model_name py_driver_2d --tracer_module_names iage \
    --cfg_fnames "$cfg_fnames" --workdir "$workdir" "$@"

cmp_nc "$workdir" grid_vars.nc
for fname in fcn_0000.nc hist_0000.nc init_iterate.nc init_iterate_0000.nc; do
    cmp_nc "$workdir/gen_init_iterate" $fname --atol 1.0e-6 --rtol 1.0e-3
done

ci_exit
