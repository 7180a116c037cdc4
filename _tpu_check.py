import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sleipnir_tpu.models.flywheel import flywheel_problem
from sleipnir_tpu.models.cart_pole import cart_pole_problem

t0=time.time()
p, X, U = flywheel_problem(N=100, total_time=5.0)
st = p.solve()
s = p._last_state
print(f"TPU flywheel N=100: {st} iters {int(s.iterations)} E0 {float(s.E0):.2e} xN {X.value(0,100):.8f} {time.time()-t0:.0f}s", flush=True)

t0=time.time()
p2, X2, U2 = cart_pole_problem(N=24, total_time=5.0)
st2 = p2.solve()
s2 = p2._last_state
print(f"TPU cart-pole N=24: {st2} iters {int(s2.iterations)} E0 {float(s2.E0):.2e} final {X2.value()[:, -1]} {time.time()-t0:.0f}s", flush=True)
# trig precision probe
import jax.numpy as jnp
xs = jnp.linspace(0, 3.2, 1000, dtype=jnp.float64)
import math
host = np.array([math.sin(float(v)) for v in np.asarray(xs)])
dev = np.asarray(jnp.sin(xs))
print("max |sin_tpu - sin_host|:", np.max(np.abs(dev - host)), flush=True)
