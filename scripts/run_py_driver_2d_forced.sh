#!/bin/bash
# full py_driver_2d solve with the parameterized `forced` tracer module in one
# of three named configurations (capability parity with the reference's three
# run_py_driver_2d_forced_* scripts):
#   iage          ideal-age analog: zero surface restoring target, constant
#                 +1/yr interior source
#   o2_like       oxygen-like: saturated (=1) surface, file-based consumption
#                 scaled from po4 uptake, thresholded sink
#   preformed_po4 preformed-PO4: file-based surface restoring, no interior
#                 sources/sinks
# usage: scripts/run_py_driver_2d_forced.sh <preset> [extra setup args...]
set -e
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds

preset=${1:?"usage: $0 iage|o2_like|preformed_po4 [setup args...]"}
shift

: "${CI_WORKROOT:=${HOME}}"
workdir=$CI_WORKROOT/py_driver_2d_forced_$preset
rm -rf "$workdir" && mkdir -p "$workdir"
input_dir=$(pwd)/input/py_driver_2d

case $preset in
iage)
    suff=iage
    cat > "$workdir/override.cfg" <<EOF
[modelinfo]
forced_surf_restore_opt = const
forced_surf_restore_const = 0.0
forced_surf_restore_rate_10m = 1.0 / 3600.0

forced_sms_opt = const
forced_sms_const = 1.0 / (365.0 * 86400.0)
EOF
    ;;
o2_like)
    suff=o2_like
    cat > "$workdir/override.cfg" <<EOF
[modelinfo]
forced_surf_restore_opt = const
forced_surf_restore_const = 1.0
forced_surf_restore_rate_10m = 1.0 / 3600.0

forced_sms_opt = file
forced_sms_fname = $input_dir/po4_sms.nc
forced_sms_varname = po4_sms
forced_sms_scalef = -1.0 / 3.0
forced_sink_thres = 0.05
EOF
    ;;
preformed_po4)
    suff=po4_pf
    cat > "$workdir/override.cfg" <<EOF
[modelinfo]
forced_surf_restore_opt = file
forced_surf_restore_fname = $input_dir/po4_surf.nc
forced_surf_restore_varname = po4
forced_surf_restore_rate_10m = 1.0 / 3600.0

forced_sms_opt = none
EOF
    ;;
*)
    echo "unknown preset: $preset" >&2
    exit 2
    ;;
esac

cfg_fnames=$input_dir/newton_krylov.cfg,$input_dir/model_params.cfg,$workdir/override.cfg

echo "running setup_solver.sh (forced_{suff}:$suff)"
./scripts/setup_solver.sh --model_name py_driver_2d --cfg_fnames "$cfg_fnames" \
    --workdir "$workdir" --newton_max_iter 10 --persist --fp_cnt 1 \
    --tracer_module_names "forced_{suff}:$suff" "$@"

echo running nk_driver.sh
"$workdir/nk_driver.sh"
