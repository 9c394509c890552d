#!/bin/bash
# regenerate fn-evals for every test_problem module family and compare
# against baselines from scripts/baseline_gen_fcn.sh (metadata + values via
# the baseline_cmp CLI rather than ncdump text diffs)
set -e
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds

: "${BASELINE_WORKROOT:=${HOME}/nk_fcn_baselines}"
err_cnt=0

for module in iage phosphorus "dye_decay_{suff}:100" "dye_decay_{suff}:010"; do
    baseline=$BASELINE_WORKROOT/baseline_$module
    workdir=$BASELINE_WORKROOT/expr_$module
    rm -rf "$workdir"
    ./scripts/setup_solver.sh --fp_cnt 1 --depth_nlevs 20 \
        --tracer_module_names "$module" --workdir "$workdir" "$@"
    for fname in hist_00.nc fcn_00.nc; do
        echo "comparing $fname for $module"
        python -m newton_krylov_ooc_tpu.cli.baseline_cmp --fname "$fname" \
            --expr_dir "$workdir/gen_init_iterate" \
            --baseline_dir "$baseline/gen_init_iterate" \
            || err_cnt=$((err_cnt+1))
    done
done
echo err_cnt=$err_cnt
exit $err_cnt
