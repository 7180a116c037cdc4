import numpy as np, time
import jax, jax.numpy as jnp
idx = np.arange(20).reshape(4,5)
def f(x):
    v = x[idx]           # gather with numpy index array
    return jnp.sum(v**2)
x = jnp.zeros(25)
H = np.asarray(jax.jit(jax.hessian(f))(x))
print("gather hessian finite:", np.all(np.isfinite(H)))
def f2(x):
    v = jax.lax.slice(x, (0,), (20,)).reshape(4,5)
    return jnp.sum(v**2)
H2 = np.asarray(jax.jit(jax.hessian(f2))(x))
print("slice hessian finite:", np.all(np.isfinite(H2)))
