"""Problem mutation & callback APIs (reference: problem_test.cc,
evaluation_callback_test.cc in the Ceres lineage's test layout —
SURVEY.md §5.4)."""

import jax.numpy as jnp
import numpy as np

from skeres_tpu.core.callbacks import EvaluationCallback, StateUpdatingCallback
from skeres_tpu.core.options import SolverOptions
from skeres_tpu.core.problem import Problem
from skeres_tpu.core.solver import solve


def _quad(params, data):
    (x,) = params
    return x - data


def _build(n=4):
    p = Problem()
    blocks = [p.add_parameter_block(np.array([float(i + 5)])) for i in range(n)]
    ids = [
        p.add_residual_block(_quad, None, [b], data=jnp.array([float(i)]))
        for i, b in enumerate(blocks)
    ]
    return p, blocks, ids


def test_remove_residual_block():
    p, blocks, ids = _build()
    assert p._num_residual_blocks == 4
    p.remove_residual_block(ids[1])
    assert p._num_residual_blocks == 3
    # removing twice raises
    try:
        p.remove_residual_block(ids[1])
        assert False, "expected KeyError"
    except KeyError:
        pass
    prog = p.compile()
    assert prog.num_residual_blocks == 3


def test_remove_parameter_block_drops_its_residuals():
    p, blocks, ids = _build()
    p.remove_parameter_block(blocks[2])
    assert p._num_residual_blocks == 3
    assert p.is_parameter_block_constant(blocks[2])
    # solve still works and drives the remaining blocks to their data
    options = SolverOptions(max_num_iterations=10)
    summary = solve(options, p)
    assert summary.final_cost < 1e-10
    np.testing.assert_allclose(blocks[0].value, [0.0], atol=1e-5)
    # removed block untouched
    np.testing.assert_allclose(blocks[2].value, [7.0], atol=1e-12)


def test_remove_all_blocks_of_a_batch():
    p, blocks, ids = _build(2)
    p.remove_residual_block(ids[0])
    p.remove_residual_block(ids[1])
    assert p._num_residual_blocks == 0
    assert not p._batches


def test_state_updating_and_update_state_every_iteration():
    p, blocks, ids = _build(2)
    options = SolverOptions(max_num_iterations=5, update_state_every_iteration=True)
    seen = []

    def spy(it, state):
        # state must be live device arrays matching the group layout
        seen.append(float(jnp.sum(state[0])))

    options.callbacks = [spy]
    solve(options, p)
    assert len(seen) >= 1


def test_evaluation_callback_fires():
    p, blocks, ids = _build(2)

    class Spy(EvaluationCallback):
        def __init__(self):
            self.calls = []

        def prepare_for_evaluation(self, evaluate_jacobians, new_point):
            self.calls.append((evaluate_jacobians, new_point))

    spy = Spy()
    options = SolverOptions(max_num_iterations=3, evaluation_callback=spy)
    solve(options, p)
    assert spy.calls, "EvaluationCallback never fired"
    # first dispatch is the initial full linearization: jacobians at a new point
    assert spy.calls[0] == (True, True)
