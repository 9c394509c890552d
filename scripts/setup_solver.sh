#!/bin/bash
# dispatch setup_solver by --model_name (default test_problem)
set -e
cd "$(dirname "$0")/.."
source scripts/newton_krylov_env_cmds

model_name=test_problem
args=("$@")
for ((i=0; i<${#args[@]}; i++)); do
    if [ "${args[$i]}" == "--model_name" ]; then
        model_name=${args[$((i+1))]}
    fi
done

python -m newton_krylov_ooc_tpu.models.${model_name}.setup_solver "$@"
