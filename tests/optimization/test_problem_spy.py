"""Spy sparsity-file emission (reference
test/src/optimization/problem_spy_test.cpp; format documented at
reference util/spy.hpp:20-44)."""

import os
import struct


from sleipnir_tpu import ExitStatus, Problem


def _read_spy(path):
    """Parse a .spy file into (title, row_label, col_label, rows, cols,
    frames) where each frame is a list of (row, col, sign)."""
    with open(path, "rb") as f:
        def read_str():
            (n,) = struct.unpack("<i", f.read(4))
            return f.read(n).decode("utf-8")

        title = read_str()
        row_label = read_str()
        col_label = read_str()
        (rows,) = struct.unpack("<i", f.read(4))
        (cols,) = struct.unpack("<i", f.read(4))
        frames = []
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (count,) = struct.unpack("<i", head)
            frame = []
            for _ in range(count):
                r, c = struct.unpack("<ii", f.read(8))
                sign = f.read(1).decode()
                frame.append((r, c, sign))
            frames.append(frame)
        return title, row_label, col_label, rows, cols, frames


def test_problem_spy(tmp_path):
    """solve(spy=True) writes H.spy / A_e.spy / A_i.spy with one frame per
    iteration (reference problem.hpp:569-594)."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        problem = Problem()
        x = problem.decision_variable()
        y = problem.decision_variable()
        x.set_value(2.0)
        y.set_value(3.0)
        problem.minimize((x - 1.0) ** 2 + (y - 2.0) ** 2)
        problem.subject_to(x + y == 4.0)
        problem.subject_to(x >= 0.5)
        status = problem.solve(spy=True)
        assert status == ExitStatus.SUCCESS

        for name in ("H.spy", "A_e.spy", "A_i.spy"):
            assert os.path.exists(name), name

        title, rl, cl, rows, cols, frames = _read_spy("H.spy")
        assert title == "Hessian"
        assert (rows, cols) == (2, 2)
        assert len(frames) >= 1

        _, _, _, rows_e, cols_e, frames_e = _read_spy("A_e.spy")
        assert (rows_e, cols_e) == (1, 2)
        # A_e for x + y == 4 is [1, 1] at every iterate
        for frame in frames_e:
            assert sorted((r, c) for r, c, _ in frame) == [(0, 0), (0, 1)]
            assert all(s == "+" for _, _, s in frame)

        _, _, _, rows_i, cols_i, frames_i = _read_spy("A_i.spy")
        assert (rows_i, cols_i) == (1, 2)
        for frame in frames_i:
            assert [(r, c) for r, c, _ in frame] == [(0, 0)]
    finally:
        os.chdir(cwd)
