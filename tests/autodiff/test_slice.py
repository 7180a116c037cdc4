"""Python-slice indexing semantics on VariableMatrix/VariableBlock
(reference test/src/autodiff/slice_test.cpp and the slicing cases of
variable_matrix_test.cpp; the reference reimplements Python slice
semantics in C++ — here they're native, so these tests pin the same
observable behavior)."""

import numpy as np

from sleipnir_tpu import VariableMatrix


def _mat(rows, cols):
    m = VariableMatrix(rows, cols)
    m.set_value(np.arange(rows * cols, dtype=float).reshape(rows, cols))
    return m


def test_single_index_negative():
    """Negative scalar indices wrap (reference slice.hpp negative-index
    semantics)."""
    m = _mat(3, 2)
    assert m[-1, -1].value() == 5.0
    assert m[-2, 0].value() == 2.0
    assert m[2, 1].value() == 5.0


def test_full_slice():
    m = _mat(4, 3)
    b = m[:, :]
    assert b.shape == (4, 3)
    np.testing.assert_allclose(b.value(), m.value())


def test_row_and_col_slices():
    m = _mat(4, 3)
    np.testing.assert_allclose(
        m[1:3, :].value(), m.value()[1:3, :]
    )
    np.testing.assert_allclose(
        m[:, 1:].value(), m.value()[:, 1:]
    )
    np.testing.assert_allclose(
        m[:-1, :-1].value(), m.value()[:-1, :-1]
    )


def test_step_slices():
    m = _mat(6, 4)
    np.testing.assert_allclose(m[::2, :].value(), m.value()[::2, :])
    np.testing.assert_allclose(m[1::2, ::2].value(), m.value()[1::2, ::2])


def test_slice_of_slice():
    m = _mat(6, 6)
    b = m[1:5, 1:5]
    np.testing.assert_allclose(
        b[1:3, 1:3].value(), m.value()[2:4, 2:4]
    )


def test_assign_through_slice():
    """Writes through a block view land in the parent
    (reference variable_block.hpp:27 write-through semantics)."""
    m = _mat(4, 4)
    m[1:3, 1:3] = np.zeros((2, 2))
    expected = np.arange(16, dtype=float).reshape(4, 4)
    expected[1:3, 1:3] = 0.0
    np.testing.assert_allclose(m.value(), expected)

    # Assignment of an expression block
    m2 = _mat(4, 4)
    m2[0:2, 0:2] = m2[2:4, 2:4] * 2.0
    expected2 = np.arange(16, dtype=float).reshape(4, 4)
    expected2[0:2, 0:2] = expected2[2:4, 2:4] * 2.0
    np.testing.assert_allclose(m2.value(), expected2)


def test_block_view_write_through_setitem():
    m = _mat(5, 5)
    b = m.block(1, 1, 3, 3)
    b[0, 0] = 99.0
    assert m.value()[1, 1] == 99.0

    b[1:3, 1:3] = np.ones((2, 2)) * -1.0
    assert np.all(m.value()[2:4, 2:4] == -1.0)


def test_vector_single_slice():
    """Single (non-tuple) slice on a column vector selects rows."""
    v = _mat(5, 1)
    np.testing.assert_allclose(v[1:4].value(), v.value()[1:4])
    assert v[-1].value() == 4.0
