"""Arm-on-elevator problem (mirrors reference
python/test/optimization/arm_on_elevator_problem_test.py, N reduced from
800 to 100 for CI time; exercises the DSL auto-vectorization on four
isomorphic loop-built constraint families plus a nonlinear height limit)."""

import math

import numpy as np
import pytest

import sleipnir_tpu as slp
from sleipnir_tpu import ExitStatus, ExpressionType, Problem
from sleipnir_tpu.autodiff.variable import bounds


def test_arm_on_elevator_problem():
    N = 100

    ELEVATOR_START_HEIGHT = 1.0
    ELEVATOR_END_HEIGHT = 1.25
    ELEVATOR_MAX_VELOCITY = 1.0
    ELEVATOR_MAX_ACCELERATION = 2.0

    ARM_LENGTH = 1.0
    ARM_START_ANGLE = 0.0
    ARM_END_ANGLE = math.pi
    ARM_MAX_VELOCITY = 2.0 * math.pi
    ARM_MAX_ACCELERATION = 4.0 * math.pi

    END_EFFECTOR_MAX_HEIGHT = 1.8

    TOTAL_TIME = 4.0
    dt = TOTAL_TIME / N

    problem = Problem()

    elevator = problem.decision_variable(2, N + 1)
    elevator_accel = problem.decision_variable(1, N)
    arm = problem.decision_variable(2, N + 1)
    arm_accel = problem.decision_variable(1, N)

    for k in range(N):
        problem.subject_to(
            elevator[0, k + 1]
            == elevator[0, k]
            + elevator[1, k] * dt
            + 0.5 * elevator_accel[0, k] * dt**2
        )
        problem.subject_to(
            elevator[1, k + 1] == elevator[1, k] + elevator_accel[0, k] * dt
        )
        problem.subject_to(
            arm[0, k + 1]
            == arm[0, k] + arm[1, k] * dt + 0.5 * arm_accel[0, k] * dt**2
        )
        problem.subject_to(arm[1, k + 1] == arm[1, k] + arm_accel[0, k] * dt)

    problem.subject_to(
        elevator[:, :1] == np.array([[ELEVATOR_START_HEIGHT], [0.0]])
    )
    problem.subject_to(
        elevator[:, N : N + 1] == np.array([[ELEVATOR_END_HEIGHT], [0.0]])
    )
    problem.subject_to(arm[:, :1] == np.array([[ARM_START_ANGLE], [0.0]]))
    problem.subject_to(
        arm[:, N : N + 1] == np.array([[ARM_END_ANGLE], [0.0]])
    )

    problem.subject_to(
        bounds(
            -ELEVATOR_MAX_VELOCITY, elevator[1:2, :], ELEVATOR_MAX_VELOCITY
        )
    )
    problem.subject_to(
        bounds(
            -ELEVATOR_MAX_ACCELERATION,
            elevator_accel,
            ELEVATOR_MAX_ACCELERATION,
        )
    )
    problem.subject_to(
        bounds(-ARM_MAX_VELOCITY, arm[1:2, :], ARM_MAX_VELOCITY)
    )
    problem.subject_to(
        bounds(-ARM_MAX_ACCELERATION, arm_accel, ARM_MAX_ACCELERATION)
    )

    # End-effector height limit
    heights = elevator[:1, :] + ARM_LENGTH * slp.sin(arm[:1, :])
    problem.subject_to(heights <= END_EFFECTOR_MAX_HEIGHT)

    problem.minimize(
        sum(
            (ELEVATOR_END_HEIGHT - elevator[0, k]) ** 2
            + (ARM_END_ANGLE - arm[0, k]) ** 2
            for k in range(N + 1)
        )
    )

    assert problem.cost_function_type() == ExpressionType.QUADRATIC
    assert problem.equality_constraint_type() == ExpressionType.LINEAR
    assert problem.inequality_constraint_type() == ExpressionType.NONLINEAR

    assert problem.solve() == ExitStatus.SUCCESS

    # End conditions and height limit hold
    np.testing.assert_allclose(
        elevator.value()[:, N], [ELEVATOR_END_HEIGHT, 0.0], atol=1e-6
    )
    np.testing.assert_allclose(
        arm.value()[:, N], [ARM_END_ANGLE, 0.0], atol=1e-6
    )
    h = elevator.value()[0] + ARM_LENGTH * np.sin(arm.value()[0])
    assert np.all(h <= END_EFFECTOR_MAX_HEIGHT + 1e-7)
