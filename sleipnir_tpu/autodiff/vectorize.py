"""Auto-vectorization of isomorphic expression blocks.

Reference-style problems build constraints and costs in Python loops — one
block/term per timestep with identical structure but different variables
and constants (e.g. reference benchmarks/scalability/flywheel/main.cpp, or
python/test/optimization/flywheel_problem_test.py:29-41). Evaluating those
naively makes the traced program O(N·nodes) and XLA compile times blow up.

`BlockCompiler` groups constraint blocks (and flattened cost-sum terms) by
structural signature and evaluates each group with one `jax.vmap` over
stacked leaf data, so the compiled program is O(unique structures): the
same asymptotics the reference gets from setup-time derivative caching
(reference autodiff/jacobian.hpp:84-105), applied to the whole pipeline.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from sleipnir_tpu.autodiff import expression as ex
from sleipnir_tpu.autodiff.expression import (
    CompiledEval,
    ConstExpr,
    DecVarExpr,
    Expr,
    OpExpr,
)

#: Minimum isomorphic blocks worth batching.
MIN_GROUP = 4


class SigInterner:
    """Interns structural signatures to small integers so DAGs with heavy
    sharing (e.g. single-shooting RK4 chains) hash in O(nodes), not
    O(expanded tree)."""

    def __init__(self) -> None:
        self._table: dict = {}
        self.special: set[int] = set()

    def intern(self, key, special: bool) -> int:
        sid = self._table.get(key)
        if sid is None:
            sid = len(self._table)
            self._table[key] = sid
            if special:
                self.special.add(sid)
        return sid


def _signature(e: Expr, memo: dict, interner: SigInterner) -> int:
    key = id(e)
    sig = memo.get(key)
    if sig is None:
        if isinstance(e, ConstExpr):
            sig = interner.intern(("c", e.shape), False)
        elif isinstance(e, DecVarExpr):
            sig = interner.intern(("v", e.shape), False)
        else:
            assert isinstance(e, OpExpr)
            if e.op in ("grad", "jac"):
                sig = interner.intern(("special", id(e)), True)
            else:
                child_sigs = tuple(
                    _signature(a, memo, interner) for a in e.args
                )
                special = any(c in interner.special for c in child_sigs)
                sig = interner.intern(
                    (e.op, _hashable(e.static), e.shape, child_sigs),
                    special,
                )
        memo[key] = sig
    return sig


def _hashable(static):
    def conv(v):
        if isinstance(v, np.ndarray):
            return ("nd", v.shape, tuple(v.ravel().tolist()))
        if isinstance(v, tuple):
            return tuple(conv(x) for x in v)
        return v

    return conv(static)


def _collect_leaves(e: Expr, seen: set, out: list) -> None:
    """Deterministic DFS leaf collection (first-visit order); isomorphic
    blocks yield aligned slots."""
    key = id(e)
    if key in seen:
        return
    seen.add(key)
    if isinstance(e, (ConstExpr, DecVarExpr)):
        out.append(e)
        return
    for a in e.args:
        _collect_leaves(a, seen, out)


def flatten_add_chain(e: Expr, out: list, sign: float = 1.0) -> None:
    """Flatten nested scalar adds/subs into a signed term list."""
    if isinstance(e, OpExpr) and e.shape == ():
        if e.op == "add":
            flatten_add_chain(e.args[0], out, sign)
            flatten_add_chain(e.args[1], out, sign)
            return
        if e.op == "sub":
            flatten_add_chain(e.args[0], out, sign)
            flatten_add_chain(e.args[1], out, -sign)
            return
        if e.op == "neg":
            flatten_add_chain(e.args[0], out, -sign)
            return
    out.append((sign, e))


class _Group:
    """A batch of isomorphic expressions evaluated with one vmap."""

    __slots__ = ("indices", "template", "slot_kinds", "var_idx", "const_vals")

    def __init__(self, indices, template, slot_kinds, var_idx, const_vals):
        self.indices = indices
        self.template = template
        self.slot_kinds = slot_kinds  # "v" | "c" per slot
        self.var_idx = var_idx  # {slot: (k, *shape) position array}
        self.const_vals = const_vals  # {slot: (k, *shape) value array}

    def evaluate(self, combined, xp):
        """Returns the stacked (k, *shape) result."""
        import jax  # noqa: PLC0415

        leaves: list = []
        _collect_leaves(self.template, set(), leaves)

        args = []
        axes = []
        for slot, _leaf in enumerate(leaves):
            if self.slot_kinds[slot] == "v":
                args.append(combined[self.var_idx[slot]])
            else:
                args.append(xp.asarray(self.const_vals[slot]))
            axes.append(0)

        def block_eval(*leaf_vals):
            bind = {id(leaf): leaf_vals[s] for s, leaf in enumerate(leaves)}
            cache: dict[int, object] = {}

            def rec(e: Expr):
                key = id(e)
                if key in cache:
                    return cache[key]
                if key in bind:
                    v = bind[key]
                else:
                    assert isinstance(e, OpExpr), e
                    vals = [rec(a) for a in e.args]
                    v = ex._EVAL[e.op](xp, e.static, *vals)
                cache[key] = v
                return v

            return rec(self.template)

        if xp is np:
            k = len(self.indices)
            return np.stack(
                [block_eval(*[a[j] for a in args]) for j in range(k)]
            )
        return jax.vmap(block_eval)(*args)


def _try_group(blocks: Sequence[Expr], indices: list, pos_of_id: dict):
    """Build a _Group from isomorphic blocks, or None."""
    template = blocks[indices[0]]
    leaf_lists = []
    for i in indices:
        leaves: list = []
        _collect_leaves(blocks[i], set(), leaves)
        leaf_lists.append(leaves)
        if len(leaves) != len(leaf_lists[0]):
            return None
    slot_kinds = []
    var_idx = {}
    const_vals = {}
    k = len(indices)
    for slot, leaf0 in enumerate(leaf_lists[0]):
        if isinstance(leaf0, DecVarExpr):
            slot_kinds.append("v")
            var_idx[slot] = np.stack(
                [
                    np.vectorize(pos_of_id.__getitem__, otypes=[np.int64])(
                        leaf_lists[j][slot].ids
                    )
                    if leaf_lists[j][slot].ids.size
                    else np.zeros(leaf0.ids.shape, np.int64)
                    for j in range(k)
                ]
            )
        else:
            slot_kinds.append("c")
            const_vals[slot] = np.stack(
                [leaf_lists[j][slot].value for j in range(k)]
            )
    return _Group(indices, template, slot_kinds, var_idx, const_vals)


class BlockCompiler:
    """Compiles (cost, equality blocks, inequality blocks) into functions
    of (x, params) with isomorphic structures batched.

    Functional blocks (`fn` entries: callables of the flat x) pass through
    untouched. Returned constraint vectors preserve the original
    declaration row order (dual-variable layouts match the loop-built
    order, like reference make_constraints row-major flattening).
    """

    def __init__(self, cost_expr, eq_entries, ineq_entries, wrt_ids) -> None:
        self.eq_entries = list(eq_entries)
        self.ineq_entries = list(ineq_entries)

        all_exprs = [cost_expr]
        for entry in self.eq_entries + self.ineq_entries:
            if isinstance(entry, Expr):
                all_exprs.append(entry)
        self.compiled = CompiledEval(all_exprs, wrt_ids)
        pos = self.compiled._pos
        interner = SigInterner()
        sig_memo: dict = {}

        # -- cost: flatten the Σ-chain and group isomorphic terms ----------
        terms: list = []
        flatten_add_chain(cost_expr, terms)
        self._cost_singles: list = []  # (sign, expr)
        self._cost_groups: list = []  # (signs (k,), _Group)
        by_sig: dict = {}
        for sign, term in terms:
            sig = _signature(term, sig_memo, interner)
            by_sig.setdefault(sig, []).append((sign, term))
        for sig, items in by_sig.items():
            if len(items) < MIN_GROUP or sig in interner.special:
                self._cost_singles.extend(items)
                continue
            exprs = [t for _s, t in items]
            grp = _try_group(exprs, list(range(len(exprs))), pos)
            if grp is None:
                self._cost_singles.extend(items)
            else:
                signs = np.array([s for s, _t in items])
                self._cost_groups.append((signs, grp))

        # -- constraints ---------------------------------------------------
        self._eq = self._plan_blocks(
            self.eq_entries, pos, interner, sig_memo
        )
        self._ineq = self._plan_blocks(
            self.ineq_entries, pos, interner, sig_memo
        )

    # -- planning ----------------------------------------------------------

    def _plan_blocks(self, entries, pos, interner, sig_memo):
        """Returns (parts, perm, total_rows): parts are ('fn', fn) /
        ('single', expr) / ('group', _Group); perm reorders the
        concatenated part outputs back to declaration order."""
        rows_of = []
        offset = 0
        offsets = []
        for entry in entries:
            r = entry.rows if not isinstance(entry, Expr) else entry.size
            offsets.append(offset)
            rows_of.append(r)
            offset += r
        total = offset

        by_sig: dict = {}
        for i, entry in enumerate(entries):
            if isinstance(entry, Expr):
                sig = _signature(entry, sig_memo, interner)
                if sig in interner.special:
                    sig = ("special", i)
            else:
                sig = ("fn", i)
            by_sig.setdefault(sig, []).append(i)

        parts = []
        order = []  # original row indices in part-output order
        for sig, idxs in by_sig.items():
            grouped = None
            if (
                len(idxs) >= MIN_GROUP
                and isinstance(entries[idxs[0]], Expr)
            ):
                grouped = _try_group(
                    [entries[i] for i in idxs], list(range(len(idxs))), pos
                )
                if grouped is not None:
                    grouped.indices = idxs
            if grouped is not None:
                parts.append(("group", grouped))
                for i in idxs:
                    order.extend(range(offsets[i], offsets[i] + rows_of[i]))
            else:
                for i in idxs:
                    entry = entries[i]
                    if isinstance(entry, Expr):
                        parts.append(("single", entry))
                    else:
                        parts.append(("fn", entry))
                    order.extend(range(offsets[i], offsets[i] + rows_of[i]))

        # perm[j] = position in part-output order of original row j
        order = np.asarray(order, dtype=np.int64)
        perm = np.zeros(total, dtype=np.int64)
        perm[order] = np.arange(total)
        return parts, perm, total

    # -- evaluation --------------------------------------------------------

    def num_params(self) -> int:
        return self.compiled.num_params()

    def gather_params(self) -> np.ndarray:
        return self.compiled.gather_params()

    def _combined(self, x, params, xp):
        return xp.concatenate(
            [
                xp.asarray(x, dtype=xp.float64).ravel(),
                xp.asarray(params, dtype=xp.float64).ravel(),
            ]
        )

    def f(self, x, params, xp=None):
        import jax.numpy as jnp  # noqa: PLC0415

        if xp is None:
            xp = jnp
        combined = self._combined(x, params, xp)
        total = xp.asarray(0.0, combined.dtype)
        cache: dict[int, object] = {}
        for sign, term in self._cost_singles:
            v = self.compiled.eval_expr(term, combined, xp, cache)
            total = total + sign * xp.reshape(v, ())
        for signs, grp in self._cost_groups:
            stacked = grp.evaluate(combined, xp)
            total = total + xp.sum(
                xp.asarray(signs) * xp.reshape(stacked, (len(signs),))
            )
        return total

    def _constraints(self, plan, x, params, xp):
        import jax.numpy as jnp  # noqa: PLC0415

        if xp is None:
            xp = jnp
        parts, perm, total = plan
        if total == 0:
            return xp.zeros((0,), xp.float64)
        combined = self._combined(x, params, xp)
        outs = []
        cache: dict[int, object] = {}
        for kind, payload in parts:
            if kind == "fn":
                outs.append(xp.reshape(payload.fn(x), (-1,)))
            elif kind == "single":
                v = self.compiled.eval_expr(payload, combined, xp, cache)
                outs.append(xp.reshape(v, (-1,)))
            else:
                outs.append(xp.reshape(payload.evaluate(combined, xp), (-1,)))
        flat = xp.concatenate(outs)
        return flat[perm]

    def c_e(self, x, params, xp=None):
        return self._constraints(self._eq, x, params, xp)

    def c_i(self, x, params, xp=None):
        return self._constraints(self._ineq, x, params, xp)
