"""Current manager example test (mirrors reference
examples/current_manager/test/current_manager_test.py)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "examples"))

from current_manager import CurrentManager  # noqa: E402


def test_current_manager_enough_current():
    manager = CurrentManager([1.0, 5.0, 10.0, 5.0], 40.0)
    currents = manager.calculate([25.0, 10.0, 5.0, 0.0])

    assert currents[0] == pytest.approx(25.0, abs=1e-3)
    assert currents[1] == pytest.approx(10.0, abs=1e-3)
    assert currents[2] == pytest.approx(5.0, abs=1e-3)
    assert currents[3] == pytest.approx(0.0, abs=1e-3)


def test_current_manager_not_enough_current():
    manager = CurrentManager([1.0, 5.0, 10.0, 5.0], 40.0)
    currents = manager.calculate([30.0, 10.0, 5.0, 0.0])

    assert currents[0] == pytest.approx(29.960, abs=1e-3)
    assert currents[1] == pytest.approx(9.008, abs=1e-3)
    assert currents[2] == pytest.approx(1.032, abs=1e-3)
    assert currents[3] == pytest.approx(0.0, abs=1e-3)
