import numpy as np, time
import jax, jax.numpy as jnp
from sleipnir_tpu.models.cart_pole import cart_pole_problem
from sleipnir_tpu.optimization.solver.options import Options
from sleipnir_tpu.autodiff import expression as ex

problem, X, U = cart_pole_problem(N=100, total_time=5.0)
comp = problem._compile()
f_raw, ce_raw, ci_raw = comp["f"], comp["c_e"], comp["c_i"]
params = jnp.asarray(comp["compiled"].gather_params())
x0 = jnp.asarray(ex._registry.get(problem._all_ids()))
me, mi, n = comp["me"], comp["mi"], comp["n"]
y = jnp.ones(me); z = jnp.ones(mi)
v = jnp.asarray(np.random.default_rng(0).standard_normal(n))

def hvp_of(fun):
    g = jax.grad(fun)
    return jax.jit(lambda x: jax.jvp(g, (x,), (v,))[1])

@jax.jit
def all_probes(x):
    r = {}
    r["f"] = jnp.all(jnp.isfinite(jax.jvp(jax.grad(lambda xv: f_raw(xv, params)), (x,), (v,))[1]))
    r["ce"] = jnp.all(jnp.isfinite(jax.jvp(jax.grad(lambda xv: y @ ce_raw(xv, params)), (x,), (v,))[1]))
    r["ci"] = jnp.all(jnp.isfinite(jax.jvp(jax.grad(lambda xv: z @ ci_raw(xv, params)), (x,), (v,))[1]))
    return r
t0=time.time()
out = all_probes(x0)
print({k: bool(val) for k, val in out.items()}, f"{time.time()-t0:.0f}s", flush=True)
