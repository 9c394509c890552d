#!/bin/bash
# robustness CI: full Newton solve from a zero initial iterate
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds

err_cnt=0
: "${CI_WORKROOT:=${HOME}/nk_tpu_ci}"
workdir=$CI_WORKROOT/ci_zero_iage_workdir
rm -rf "$workdir" && mkdir -p "$workdir"

echo running setup_solver.sh for zero iage
./scripts/setup_solver.sh --fp_cnt 0 --depth_nlevs 20 --persist \
    --tracer_module_names iage --init_iterate_opt zeros \
    --workdir "$workdir" \
    "$@" || err_cnt=$((err_cnt+1))

echo running nk_driver.sh for zero iage
"$workdir/nk_driver.sh" || err_cnt=$((err_cnt+1))

echo err_cnt=$err_cnt
exit $err_cnt
