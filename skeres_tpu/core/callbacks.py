"""Built-in iteration callbacks.

Counterparts of the reference lineage's ``internal/ceres/callbacks.cc`` /
``include/ceres/iteration_callback.h``: callbacks are plain callables
``cb(IterationSummary) -> CallbackReturnType | None`` invoked by the host
loop after every iteration (after every chunk in the device-loop mode).
"""

from __future__ import annotations

from typing import Callable, Optional

from skeres_tpu.core.summary import IterationSummary
from skeres_tpu.core.types import CallbackReturnType

__all__ = ["LoggingCallback", "AbortAtIterationCallback", "HistoryCallback"]


class LoggingCallback:
    """Prints the canonical per-iteration line (reference: LoggingCallback)."""

    def __init__(self, log_to_stdout: bool = True):
        self.log_to_stdout = log_to_stdout

    def __call__(self, it: IterationSummary):
        msg = (
            f"{it.iteration:4d}: f:{it.cost: .6e} d:{it.cost_change: .2e} "
            f"g:{it.gradient_max_norm: .2e} h:{it.step_norm: .2e} "
            f"rho:{it.relative_decrease: .2e} mu:{it.trust_region_radius: .2e} "
            f"li:{it.linear_solver_iterations:3d} "
            f"it:{it.iteration_time_in_seconds: .2e} "
            f"tt:{it.cumulative_time_in_seconds: .2e}"
        )
        if self.log_to_stdout:
            print(msg)
        return CallbackReturnType.SOLVER_CONTINUE


class AbortAtIterationCallback:
    """Terminates the solve at a given iteration (testing / budget caps)."""

    def __init__(self, max_iteration: int, successfully: bool = True):
        self.max_iteration = max_iteration
        self.successfully = successfully

    def __call__(self, it: IterationSummary):
        if it.iteration >= self.max_iteration:
            return (
                CallbackReturnType.SOLVER_TERMINATE_SUCCESSFULLY
                if self.successfully
                else CallbackReturnType.SOLVER_ABORT
            )
        return CallbackReturnType.SOLVER_CONTINUE


class HistoryCallback:
    """Records every IterationSummary (hook point for external metrics)."""

    def __init__(self):
        self.history: list[IterationSummary] = []

    def __call__(self, it: IterationSummary):
        self.history.append(it)
        return CallbackReturnType.SOLVER_CONTINUE
