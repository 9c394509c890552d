#!/bin/bash
# robustness CI: full Newton solve from a zero initial iterate
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds
source scripts/ci_common.sh
ci_init zero_iage

run_step "running setup_solver.sh for zero iage" \
    ./scripts/setup_solver.sh --fp_cnt 0 --depth_nlevs 20 --persist \
    --tracer_module_names iage --init_iterate_opt zeros \
    --workdir "$workdir" "$@"

run_step "running nk_driver.sh for zero iage" "$workdir/nk_driver.sh"

ci_exit
