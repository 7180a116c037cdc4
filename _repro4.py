import numpy as np, time
import jax, jax.numpy as jnp
from sleipnir_tpu.models.cart_pole import cart_pole_problem
from sleipnir_tpu.optimization.solver.options import Options
from sleipnir_tpu.optimization.solver.funcs import bind, ScalingArrays
from sleipnir_tpu.autodiff import expression as ex

problem, X, U = cart_pole_problem(N=100, total_time=5.0)
comp = problem._compile()
bundle = problem._prepare_ipm(comp, Options())
backend = bundle[9]
funcs = bundle[3]
print("backend:", type(backend).__name__, flush=True)
params = jnp.asarray(comp["compiled"].gather_params())
x0 = jnp.asarray(ex._registry.get(problem._all_ids()))
t0=time.time()
scaling, _ = problem.compute_ipm_scaling(comp, bundle, np.asarray(x0), np.asarray(params))
print("scaling f:", scaling.f, "ce min/max:", scaling.c_e.min(), scaling.c_e.max(),
      "finite:", np.all(np.isfinite(scaling.c_e)) and np.all(np.isfinite(scaling.c_i)),
      f"{time.time()-t0:.0f}s", flush=True)
sc = ScalingArrays(jnp.asarray(scaling.f), jnp.asarray(scaling.c_e), jnp.asarray(scaling.c_i))

@jax.jit
def probe(x, p, sc):
    F = bind(funcs, p, sc)
    y = jnp.zeros(comp["me"]); z = jnp.ones(comp["mi"])
    d = backend.eval_derivs(F, x, y, z)
    return dict(
        f=jnp.isfinite(F.f(x)),
        g=jnp.all(jnp.isfinite(F.g(x))),
        ce=jnp.all(jnp.isfinite(F.c_e(x))),
        ci=jnp.all(jnp.isfinite(F.c_i(x))),
        Hd=jnp.all(jnp.isfinite(d.Hd)),
        Hc=jnp.all(jnp.isfinite(d.Hc)),
        Aloc=jnp.all(jnp.isfinite(d.Aloc)),
        Anext=jnp.all(jnp.isfinite(d.Anext)),
        Ailoc=jnp.all(jnp.isfinite(d.Ailoc)),
        Hd_max=jnp.max(jnp.abs(d.Hd)),
    )
t0=time.time()
out = probe(x0, params, sc)
print({k: (v.item()) for k, v in out.items()}, f"{time.time()-t0:.0f}s", flush=True)
