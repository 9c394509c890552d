#!/bin/bash
# verify that every var set in a model's newton_krylov.cfg is referenced
# somewhere in the framework source (guards against dead configuration)
set -e
cd "$(dirname "$0")/.."
model_name=$1
err_cnt=0
vars=$(grep -E "^[a-zA-Z_]+=" input/$model_name/newton_krylov.cfg | cut -d= -f1 | sort -u)
for var in $vars; do
    if ! grep -rq "$var" newton_krylov_ooc_tpu --include="*.py"; then
        echo "cfg var $var from input/$model_name/newton_krylov.cfg is unused"
        err_cnt=$((err_cnt+1))
    fi
done
exit $err_cnt
