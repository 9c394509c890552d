# shared plumbing for the CI driver scripts (source from scripts/ci_*.sh).
#
# Conventions: every check increments err_cnt on failure instead of aborting,
# so one run reports all regressions; the caller finishes with ci_exit.
# Overridable via env: BASELINE_ROOT (golden data), CI_WORKROOT (scratch).

ci_init() {
    # ci_init <name>: fresh workdir + baseline_dir for scripts/ci_<name>.sh
    err_cnt=0
    : "${BASELINE_ROOT:=baselines}"
    : "${CI_WORKROOT:=${HOME}/nk_tpu_ci}"
    workdir=$CI_WORKROOT/ci_$1_workdir
    baseline_dir=$BASELINE_ROOT/ci_$1
    log_rewrite="s%$workdir%HOME/ci_$1_workdir%g"
    rm -rf "$workdir" && mkdir -p "$workdir"
}

run_step() {
    # run_step <description> <cmd...>
    local desc=$1
    shift
    echo "$desc"
    "$@" || err_cnt=$((err_cnt+1))
}

cmp_nc() {
    # cmp_nc <expr_dir> <fname> [baseline_cmp args...]
    local expr_dir=$1 fname=$2
    shift 2
    echo "comparing $fname"
    python -m newton_krylov_ooc_tpu.cli.baseline_cmp --fname "$fname" \
        --expr_dir "$expr_dir" --baseline_dir "$baseline_dir" "$@" \
        || err_cnt=$((err_cnt+1))
}

diff_step_log() {
    # byte-compare the Newton step log against the golden copy, with the
    # scratch workdir rewritten to the baseline's canonical path
    echo "comparing Newton_state.json to baseline"
    diff -u -b <(sed "$log_rewrite" "$workdir/Newton_state.json") \
        "$baseline_dir/Newton_state.json" || err_cnt=$((err_cnt+1))
}

ci_exit() {
    echo "err_cnt=$err_cnt"
    exit "$err_cnt"
}
