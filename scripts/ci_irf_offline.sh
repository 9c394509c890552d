#!/bin/bash
# CI: irf_offline full solve on a synthetic gyre circulation.
# No reference baseline exists (the family is a beyond-reference addition),
# so the checks are self-consistency: the solve converges through the full
# CLI surface, and a --resume on the converged workdir fast-forwards
# without stepping (the step-log contract).
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds
source scripts/ci_common.sh
ci_init irf_offline

run_step "running setup_solver.sh for irf_offline" \
    ./scripts/setup_solver.sh --model_name irf_offline --fp_cnt 1 \
    --nz 4 --nlat 6 --nlon 8 --seasonal_months 4 --persist \
    --tracer_module_names iage,abio_dic_dic14 \
    --workdir "$workdir" "$@"

run_step "running nk_driver.sh for irf_offline" "$workdir/nk_driver.sh"

# the coupled gas-exchange module's diagnostics made it into the stats file
if ! python - "$workdir" <<'EOF'
import sys
from newton_krylov_ooc_tpu.utils.ncio import NCFile
with NCFile(sys.argv[1] + "/Newton_stats.nc") as fptr:
    assert fptr.has_var("SF_ABIO_DIC_horiz_int")
    assert fptr.has_var("ABIO_D14C_horiz_mean")
EOF
then
    echo "ERROR: gas-exchange stats vars missing"
    err_cnt=$((err_cnt+1))
fi

# converged iterate exists and the log reports Newton convergence
if ! grep -q "Newton convergence criterion satisfied" "$workdir"/*.log; then
    echo "ERROR: no Newton convergence in the solver log"
    err_cnt=$((err_cnt+1))
fi

run_step "resume on the converged workdir (must fast-forward cleanly)" \
    python -m newton_krylov_ooc_tpu.cli.nk_driver --model_name irf_offline \
    --persist --workdir "$workdir" --resume

ci_exit
