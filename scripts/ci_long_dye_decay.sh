#!/bin/bash
# long CI: parameterized dye_decay modules, full solve + step-log diff
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds

err_cnt=0
: "${BASELINE_ROOT:=baselines}"
: "${CI_WORKROOT:=${HOME}/nk_tpu_ci}"
workdir=$CI_WORKROOT/ci_long_dye_decay_workdir
rm -rf "$workdir" && mkdir -p "$workdir"

echo running setup_solver.sh for dye_decay
./scripts/setup_solver.sh --fp_cnt 1 --depth_nlevs 20 --persist \
    --tracer_module_names 'dye_decay_{suff}:001:010' \
    --newton_rel_tol "1.0e-6" \
    --workdir "$workdir" \
    "$@" || err_cnt=$((err_cnt+1))

echo running nk_driver.sh for dye_decay
"$workdir/nk_driver.sh" || err_cnt=$((err_cnt+1))

echo comparing Newton_state.json to baseline
diff -u -b <(sed "s%$workdir%HOME/ci_long_dye_decay_workdir%g" "$workdir/Newton_state.json") \
    "$BASELINE_ROOT/ci_long_dye_decay/Newton_state.json" || err_cnt=$((err_cnt+1))

echo err_cnt=$err_cnt
exit $err_cnt
