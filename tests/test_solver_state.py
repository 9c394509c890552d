"""tests for the resumable step-log solver state"""

import numpy as np
import pytest

from newton_krylov_ooc_tpu.core.solver_state import SolverState, action_step_log_wrap


def test_step_log_basic(tmp_workdir):
    state = SolverState("Newton", tmp_workdir)
    assert state.get_iteration() == 0
    assert not state.step_logged("my step")
    state.log_step("my step")
    assert state.step_logged("my step")
    # idempotent
    state.log_step("my step")

    state.inc_iteration()
    assert state.get_iteration() == 1
    # per-iteration steps are namespaced by iteration
    assert not state.step_logged("my step")
    state.log_step("global step", per_iteration=False)
    assert state.step_logged("global step", per_iteration=False)


def test_resume_and_rewind(tmp_workdir):
    state = SolverState("Newton", tmp_workdir)
    state.log_step("step A")
    state.log_step("step B")
    state.set_value_saved_state("beta", np.array([[1.5, 2.5]]))

    resumed = SolverState("Newton", tmp_workdir, resume=True)
    assert resumed.step_logged("step A")
    assert resumed.step_logged("step B")
    assert np.array_equal(
        resumed.get_value_saved_state("beta"), np.array([[1.5, 2.5]])
    )

    rewound = SolverState("Newton", tmp_workdir, resume=True, rewind=True)
    assert rewound.step_logged("step A")
    assert not rewound.step_logged("step B")
    assert rewound.step_was_rewound("step B")
    assert not rewound.step_was_rewound("step A")


def test_rewind_requires_resume(tmp_workdir):
    with pytest.raises(RuntimeError):
        SolverState("Newton", tmp_workdir, resume=False, rewind=True)


def test_kv_roundtrip(tmp_workdir):
    state = SolverState("Krylov", tmp_workdir)
    state.set_value_saved_state("scalar", 3)
    state.set_value_saved_state("array", np.arange(6.0).reshape(2, 3))
    assert state.get_value_saved_state("scalar") == 3
    assert np.array_equal(
        state.get_value_saved_state("array"), np.arange(6.0).reshape(2, 3)
    )


def test_action_step_log_wrap(tmp_workdir):
    state = SolverState("Newton", tmp_workdir)
    calls = []

    @action_step_log_wrap(step="do_thing {tag}")
    def do_thing(tag, solver_state):
        calls.append(tag)

    do_thing(tag="x", solver_state=state)
    do_thing(tag="x", solver_state=state)  # skipped: already logged
    do_thing(tag="y", solver_state=state)
    assert calls == ["x", "y"]
    assert state.step_logged("do_thing x")

    # solver_state=None disables logging entirely (direct in-core execution)
    do_thing(tag="x", solver_state=None)
    assert calls == ["x", "y", "x"]


def test_action_step_log_wrap_post_exit(tmp_workdir):
    state = SolverState("Newton", tmp_workdir)

    @action_step_log_wrap(step="submit", post_exit=True)
    def submit(solver_state):
        pass

    with pytest.raises(SystemExit):
        submit(solver_state=state)
    # the action was logged before exit, so a resume skips it without exiting
    state2 = SolverState("Newton", tmp_workdir, resume=True)
    submit(solver_state=state2)  # no SystemExit

def test_resume_missing_state_file(tmp_workdir):
    """top-level resume against a missing state file is a user error and
    fails loudly; only child solvers (tolerate_missing=True, the
    intent-logged-instantiation case) silently start fresh"""
    with pytest.raises(FileNotFoundError):
        SolverState("Newton", tmp_workdir, resume=True)
    with pytest.raises(FileNotFoundError):
        SolverState("Newton", tmp_workdir, resume=True, rewind=True)
    # rewind with no state file must raise even for tolerant child solvers
    with pytest.raises(FileNotFoundError):
        SolverState(
            "Krylov", tmp_workdir, resume=True, rewind=True, tolerate_missing=True
        )

    fresh = SolverState("Krylov", tmp_workdir, resume=True, tolerate_missing=True)
    assert fresh.get_iteration() == 0
    assert fresh.step_logged("__init__", per_iteration=False)


def test_kv_default(tmp_workdir):
    """get_value_saved_state: missing key raises unless a default is given
    (the fallback for state files written by earlier framework versions)"""
    state = SolverState("Krylov", tmp_workdir)
    with pytest.raises(KeyError):
        state.get_value_saved_state("absent")
    assert state.get_value_saved_state("absent", None) is None
    state.set_value_saved_state("present", 7)
    assert state.get_value_saved_state("present", None) == 7


def test_write_is_atomic_rename(tmp_workdir):
    """the state file is replaced atomically: an exception raised from the
    JSON encoder mid-write must leave the previous on-disk state intact"""
    import os

    state = SolverState("Newton", tmp_workdir)
    state.log_step("step A")

    state._saved_state["bad"] = object()  # unserializable
    with pytest.raises(TypeError):
        state.log_step("step B")

    # the partial .tmp write never reached the state file
    resumed = SolverState("Newton", tmp_workdir, resume=True)
    assert resumed.step_logged("step A")
    assert not resumed.step_logged("step B")
    assert not os.path.exists(
        os.path.join(tmp_workdir, "Newton_state.json.tmp")
    ) or os.path.getsize(os.path.join(tmp_workdir, "Newton_state.json")) > 0


def test_fresh_run_resets_stale_child_state(tmp_workdir):
    """simulate the dirty-workdir hazard at the SolverState level: a fresh
    (resume=False) construction must reset state left by a previous run"""
    old = SolverState("Krylov", tmp_workdir)
    old.log_step("KrylovSolver._solve0", per_iteration=False)
    old.set_value_saved_state("beta", np.array([[9.9]]))

    fresh = SolverState("Krylov", tmp_workdir, resume=False)
    assert not fresh.step_logged("KrylovSolver._solve0", per_iteration=False)
    assert fresh.get_value_saved_state("beta", None) is None
