#!/bin/bash
# long CI: full Newton solve of test_problem iage vs golden baselines + step log
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds

err_cnt=0
: "${BASELINE_ROOT:=baselines}"
: "${CI_WORKROOT:=${HOME}/nk_tpu_ci}"
workdir=$CI_WORKROOT/ci_long_iage_workdir
rm -rf "$workdir" && mkdir -p "$workdir"

echo running setup_solver.sh for iage
./scripts/setup_solver.sh --fp_cnt 1 --depth_nlevs 20 --persist \
    --tracer_module_names iage \
    --workdir "$workdir" \
    "$@" || err_cnt=$((err_cnt+1))

echo running nk_driver.sh for iage
"$workdir/nk_driver.sh" || err_cnt=$((err_cnt+1))

for fname in precond_00.nc precond_fcn_00.nc basis_00.nc perturb_fcn_w_raw_00.nc; do
    echo comparing $fname
    python -m newton_krylov_ooc_tpu.cli.baseline_cmp --fname $fname \
        --expr_dir "$workdir/krylov_00" \
        --baseline_dir "$BASELINE_ROOT/ci_long_iage" || err_cnt=$((err_cnt+1))
done

for fname in w_raw_00.nc w_00.nc krylov_res_00.nc; do
    echo comparing $fname
    python -m newton_krylov_ooc_tpu.cli.baseline_cmp --fname $fname \
        --expr_dir "$workdir/krylov_00" \
        --baseline_dir "$BASELINE_ROOT/ci_long_iage" \
        --rtol 2.0e-4 || err_cnt=$((err_cnt+1))
done

for fname in increment_00.nc iterate_01.nc; do
    echo comparing $fname
    python -m newton_krylov_ooc_tpu.cli.baseline_cmp --fname $fname \
        --expr_dir "$workdir" \
        --baseline_dir "$BASELINE_ROOT/ci_long_iage" \
        --rtol 2.0e-4 || err_cnt=$((err_cnt+1))
done

echo comparing Newton_state.json to baseline
diff -u -b <(sed "s%$workdir%HOME/ci_long_iage_workdir%g" "$workdir/Newton_state.json") \
    "$BASELINE_ROOT/ci_long_iage/Newton_state.json" || err_cnt=$((err_cnt+1))

echo err_cnt=$err_cnt
exit $err_cnt
