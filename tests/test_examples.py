"""Smoke tests for the breadth examples (reference lineage:
``examples/sampled_function``, ``examples/ellipse_approximation.cc``)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_sampled_function_finds_interior_minimum():
    from examples.sampled_function import main

    x = main()
    assert abs(x - 4.5) < 1e-3


def test_ellipse_approximation_converges():
    from examples.ellipse_approximation import main
    from skeres_tpu.core.types import TerminationType

    summary = main(num_points=60, num_segments=10)
    assert summary.termination_type == TerminationType.CONVERGENCE
    # the piecewise-linear fit lands near the noisy ellipse samples
    assert summary.final_cost < 0.1 * summary.initial_cost
