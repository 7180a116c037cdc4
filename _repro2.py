import numpy as np, time
import jax, jax.numpy as jnp
from sleipnir_tpu.models.cart_pole import cart_pole_problem

problem, X, U = cart_pole_problem(N=2, total_time=0.1)
comp = problem._compile()
n, me, mi = comp["n"], comp["me"], comp["mi"]
params = jnp.asarray(comp["compiled"].gather_params())
x0 = jnp.zeros(n)
ce_raw, ci_raw, f_raw = comp["c_e"], comp["c_i"], comp["f"]

def lag_e(x, y, p):
    return -(y @ ce_raw(x, p))

t0=time.time()
Hc = np.asarray(jax.jit(jax.hessian(lag_e, argnums=0))(x0, jnp.ones(me), params))
print("H_c finite:", np.all(np.isfinite(Hc)), "time", time.time()-t0, flush=True)
bad = np.argwhere(~np.isfinite(Hc))
print("bad count", bad.shape[0], "rows:", sorted(set(bad[:,0].tolist()))[:30], flush=True)

t0=time.time()
Hf = np.asarray(jax.jit(jax.hessian(f_raw, argnums=0))(x0, params))
print("H_f finite:", np.all(np.isfinite(Hf)), "time", time.time()-t0, flush=True)

def lag_i(x, z, p):
    return -(z @ ci_raw(x, p))
Hi = np.asarray(jax.jit(jax.hessian(lag_i, argnums=0))(x0, jnp.ones(mi), params))
print("H_i finite:", np.all(np.isfinite(Hi)), flush=True)

# c_e value itself and jacfwd
ce = np.asarray(jax.jit(ce_raw)(x0, params))
print("c_e finite:", np.all(np.isfinite(ce)), flush=True)
Ae = np.asarray(jax.jit(jax.jacfwd(ce_raw, argnums=0))(x0, params))
print("A_e finite:", np.all(np.isfinite(Ae)), flush=True)
