#!/bin/bash
# long CI: parameterized dye_decay modules, full solve + step-log diff
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds
source scripts/ci_common.sh
ci_init long_dye_decay

run_step "running setup_solver.sh for dye_decay" \
    ./scripts/setup_solver.sh --fp_cnt 1 --depth_nlevs 20 --persist \
    --tracer_module_names 'dye_decay_{suff}:001:010' \
    --newton_rel_tol 1.0e-6 --workdir "$workdir" "$@"

run_step "running nk_driver.sh for dye_decay" "$workdir/nk_driver.sh"

diff_step_log
ci_exit
