#!/bin/bash
# generate local fn-eval baselines for every test_problem module family;
# compare a changed tree against them with scripts/baseline_cmp_fcn.sh
set -e
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds

: "${BASELINE_WORKROOT:=${HOME}/nk_fcn_baselines}"

for module in iage phosphorus "dye_decay_{suff}:100" "dye_decay_{suff}:010"; do
    workdir=$BASELINE_WORKROOT/baseline_$module
    rm -rf "$workdir"
    ./scripts/setup_solver.sh --fp_cnt 1 --depth_nlevs 20 \
        --tracer_module_names "$module" --workdir "$workdir" "$@"
done
echo "baselines written under $BASELINE_WORKROOT"
