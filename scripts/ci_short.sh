#!/bin/bash
# short CI: unit tests + cfg-var lint + test_problem setup vs golden baselines
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds

err_cnt=0
: "${BASELINE_ROOT:=baselines}"
: "${CI_WORKROOT:=${HOME}/nk_tpu_ci}"
workdir=$CI_WORKROOT/ci_short_workdir
rm -rf "$workdir" && mkdir -p "$workdir"

echo running pytest
python -m pytest tests/ -q || err_cnt=$((err_cnt+1))

for model_dir in input/*/newton_krylov.cfg; do
    model_name=$(basename "$(dirname "$model_dir")")
    echo checking variable usage in newton_krylov.cfg for "$model_name"
    ./scripts/check_cfg_var_usage.sh "$model_name" || err_cnt=$((err_cnt+1))
done

echo running setup_solver.sh
./scripts/setup_solver.sh --fp_cnt 1 --depth_nlevs 20 --persist \
    --model_name test_problem \
    --workdir "$workdir" \
    "$@" || err_cnt=$((err_cnt+1))

for fname in depth_axis.nc; do
    echo comparing $fname
    python -m newton_krylov_ooc_tpu.cli.baseline_cmp --fname $fname \
        --expr_dir "$workdir" \
        --baseline_dir "$BASELINE_ROOT/ci_short" || err_cnt=$((err_cnt+1))
done

for fname in fcn_00.nc hist_00.nc init_iterate.nc init_iterate_00.nc; do
    echo comparing $fname
    python -m newton_krylov_ooc_tpu.cli.baseline_cmp --fname $fname \
        --expr_dir "$workdir/gen_init_iterate" \
        --baseline_dir "$BASELINE_ROOT/ci_short" || err_cnt=$((err_cnt+1))
done

echo err_cnt=$err_cnt
exit $err_cnt
