import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax
jax.config.update('jax_platforms','cpu'); jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp
from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.projections import project_bound
from ilqr_admm_tpu.solvers.batched import make_batched_lqt_admm
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost
N=100; BATCH=1024
plant = DoubleIntegrator(1,2,dt=1.0/N)
d,m = plant.x_dim, plant.u_dim
zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.,0.])])
Qs = jnp.stack([jnp.zeros((d,d)), jnp.eye(d)*1e3])
seq = np.zeros(N,dtype=np.int32); seq[-1]=1
cost = viapoint_cost(zs,Qs,seq,1e-2,m)
A,B = plant.AB(N)
rng = np.random.default_rng(0)
x0s = jnp.asarray(rng.normal(0,0.1,size=(BATCH,d)))
for iters in [100, 300]:
    solve = make_batched_lqt_admm(A,B,cost,project_u=lambda u: project_bound(u,-5.,5.),rho_u=1e-2,n_iters=iters)
    x,u = solve(x0s)
    print(f"CPU f64 iters={iters}: max|u| {float(jnp.max(jnp.abs(u))):.5f}")
