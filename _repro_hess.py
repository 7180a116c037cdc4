import numpy as np, time
import jax, jax.numpy as jnp
from sleipnir_tpu.models.cart_pole import dynamics

def rk4(x, u, h):
    k1 = dynamics(x, u)
    k2 = dynamics(x + k1*(h/2), u)
    k3 = dynamics(x + k2*(h/2), u)
    k4 = dynamics(x + k3*h, u)
    return x + (k1 + 2*k2 + 2*k3 + k4)*(h/6)

N = 2
def resid(xflat):
    Xa = xflat[:4*(N+1)].reshape(4, N+1)
    Ua = xflat[4*(N+1):].reshape(1, N+1)
    xk = jnp.moveaxis(Xa[:, :-1],1,0)[...,None]
    xk1 = jnp.moveaxis(Xa[:,1:],1,0)[...,None]
    uk = jnp.moveaxis(Ua[:, :-1],1,0)[...,None]
    res = jax.vmap(lambda a,b,c: rk4(a,c,0.05)-b)(xk, xk1, uk)
    return res.reshape(-1)

def lag(x, y):
    return -(y @ resid(x))

x0 = jnp.zeros(4*(N+1)+(N+1))
y = jnp.ones(4*N)
t0=time.time()
H = np.asarray(jax.jit(jax.hessian(lag))(x0, y))
print("compile+run", time.time()-t0, flush=True)
print("TPU hessian finite:", np.all(np.isfinite(H)), "nonfinite count:", np.sum(~np.isfinite(H)))
bad = np.argwhere(~np.isfinite(H))
if bad.size:
    print("sample bad idx:", bad[:10].tolist())
    print("vals:", H[bad[:5,0], bad[:5,1]])
# pieces: jacrev then jacfwd separately
J1 = jax.jit(jax.jacrev(lag))(x0, y)
print("jacrev finite:", bool(jnp.all(jnp.isfinite(J1))))
