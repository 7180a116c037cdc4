"""Isolate the per-fori-trip overhead on the TPU: trivial bodies vs op-count."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("TRACE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(name, fn, *args, trips=50):
    fn_j = jax.jit(fn, static_argnums=(1,))
    out = fn_j(*args, trips)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.monotonic()
        out = fn_j(*args, trips)
        jax.block_until_ready(out)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, time.monotonic() - t0)
    print(f"{name:50s} {best / trips * 1e3:9.4f} ms/trip ({best*1e3:7.1f} ms)")
    return best / trips


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.standard_normal((11, 13, 13)))

    def empty(S, trips):
        def body(_, S):
            return S * 1.0000001
        return lax.fori_loop(0, trips, body, S)

    def ten_ops(S, trips):
        def body(_, S):
            for _i in range(10):
                S = S * 1.0000001 + 1e-20
            return S
        return lax.fori_loop(0, trips, body, S)

    def forty_ops(S, trips):
        def body(_, S):
            for _i in range(40):
                S = S * 1.0000001 + 1e-20
            return S
        return lax.fori_loop(0, trips, body, S)

    def one_matmul(S, trips):
        def body(_, S):
            return jnp.einsum("pab,pbc->pac", S, S) * 1e-2
        return lax.fori_loop(0, trips, body, S)

    def five_matmul(S, trips):
        def body(_, S):
            for _i in range(5):
                S = jnp.einsum("pab,pbc->pac", S, S) * 1e-2
            return S
        return lax.fori_loop(0, trips, body, S)

    def nested_fori(S, trips):
        def body(_, S):
            def inner(_k, S):
                return S * 1.0000001
            return lax.fori_loop(0, 13, inner, S)
        return lax.fori_loop(0, trips, body, S)

    def nested_fori4(S, trips):
        def body(_, S):
            def inner(_k, S):
                return (S * 1.0000001 + 1e-20) * 0.9999999 - 1e-20
            return lax.fori_loop(0, 13, inner, S)
        return lax.fori_loop(0, trips, body, S)

    timed("empty body (1 op)", empty, S, trips=200)
    timed("10 elementwise ops", ten_ops, S, trips=200)
    timed("40 elementwise ops", forty_ops, S, trips=200)
    timed("1 matmul (11,13,13)", one_matmul, S, trips=200)
    timed("5 matmuls", five_matmul, S, trips=200)
    timed("nested fori 13x1 op", nested_fori, S, trips=200)
    timed("nested fori 13x4 ops", nested_fori4, S, trips=200)
    # f32 comparison: is emulated f64 the cost driver?
    S32 = S.astype(jnp.float32)
    timed("f32: 5 matmuls", five_matmul, S32, trips=200)
    timed("f32: 40 elementwise ops", forty_ops, S32, trips=200)
    timed("f32: nested fori 13x4 ops", nested_fori4, S32, trips=200)


if __name__ == "__main__":
    main()
