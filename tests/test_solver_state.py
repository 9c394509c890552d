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
