"""Double-float ("double-double" on f32) arithmetic for Pallas TPU kernels.

Pallas/Mosaic has no f64; XLA:TPU's own f64 emulation runs every op as a
multi-pass f32 program with ~0.1-0.3 ms device overhead per kernel, which
is the per-iteration latency floor of the IPM's factorization
(docs/tpu_numerics.md). These helpers implement error-free-transform
double-float arithmetic (Dekker/Knuth two_sum/two_prod, the QD library's
add/mul/div compositions) so an entire blocked factorization can run
INSIDE one Pallas kernel at f32 speed with ~2^-46 effective precision —
the same class as XLA's f64 emulation (measured ~1e-14 relative per op,
docs/tpu_numerics.md "Op-level accuracy").

A value x is represented as a pair (hi, lo) of f32 arrays with
x = hi + lo, |lo| <= 0.5 ulp(hi). All functions are shape-polymorphic
elementwise and work both inside Pallas kernels and in plain JAX
(interpret-mode tests compare against f64 oracles).

Reference being replaced: the f64 sparse factorization inside
reference/include/sleipnir/optimization/solver/util/regularized_ldlt.hpp.
"""

from __future__ import annotations

import jax.numpy as jnp

#: Dekker split constant for f32 (24-bit mantissa, split at 12 bits).
_SPLIT = 4097.0


def two_sum(a, b):
    """s + err = a + b exactly (Knuth)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """s + err = a + b exactly, assuming |a| >= |b| (Dekker)."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """p + err = a * b exactly (Dekker product with splitting)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add2(xh, xl, yh, yl):
    """Accurate double-float addition (QD ieee_add)."""
    s1, s2 = two_sum(xh, yh)
    t1, t2 = two_sum(xl, yl)
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def neg2(xh, xl):
    return -xh, -xl


def sub2(xh, xl, yh, yl):
    return add2(xh, xl, -yh, -yl)


def mul2(xh, xl, yh, yl):
    """Double-float multiplication (QD mul)."""
    p1, p2 = two_prod(xh, yh)
    p2 = p2 + (xh * yl + xl * yh)
    return quick_two_sum(p1, p2)


def div2(xh, xl, yh, yl):
    """Double-float division: two Newton corrections of the f32 quotient
    (QD accurate div). y == 0 is guarded to 1 like the rest of the
    factorization stack (callers key failure off pivot magnitudes)."""
    yh_safe = jnp.where(yh == 0.0, 1.0, yh)
    yl_safe = jnp.where(yh == 0.0, 0.0, yl)
    q1 = xh / yh_safe
    # r = x - q1*y
    th, tl = mul2(q1, jnp.zeros_like(q1), yh_safe, yl_safe)
    rh, rl = sub2(xh, xl, th, tl)
    q2 = rh / yh_safe
    th, tl = mul2(q2, jnp.zeros_like(q2), yh_safe, yl_safe)
    rh, _rl = sub2(rh, rl, th, tl)
    q3 = rh / yh_safe
    q1, q2 = quick_two_sum(q1, q2)
    return add2(q1, q2, q3, jnp.zeros_like(q3))


def from_f64(x):
    """Split an f64 array into an exact (hi, lo) f32 pair."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(hi, lo):
    """Recombine a (hi, lo) pair into f64."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)
