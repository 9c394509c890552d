#!/bin/bash
# verify that every var set in a model's cfg files is referenced in the
# framework source or used via cfg interpolation (guards dead configuration)
set -e
cd "$(dirname "$0")/.."
model_name=$1
err_cnt=0

# keys accessed through computed names (f"{solver_name}_min_iter" etc.)
dynamic_keys="krylov_min_iter newton_min_iter krylov_rel_tol newton_rel_tol krylov_workdir"
# axis-definition keys are read as f"{axisname}_{key}" (setup_solver)
dynamic_patterns='^[a-z]+_(units|nlevs|edge_start|edge_end|delta_ratio_max|delta_start)$'

for cfg_fname in input/$model_name/*.cfg; do
    vars=$(cut -f1 -d'#' "$cfg_fname" | grep -iE '^[a-z].*=' | cut -f1 -d= | sort -u)
    for var in $vars; do
        if echo " $dynamic_keys " | grep -q " $var "; then continue; fi
        if echo "$var" | grep -qE "$dynamic_patterns"; then continue; fi
        if grep -rq "$var" newton_krylov_ooc_tpu --include="*.py"; then continue; fi
        # interpolation usage inside the cfg files themselves
        if cut -f1 -d'#' input/$model_name/*.cfg | grep -q "%($var)s"; then continue; fi
        echo "cfg var $var from $cfg_fname is unused"
        err_cnt=$((err_cnt+1))
    done
done
exit $err_cnt
