import os

# persistent compile cache (first tunnel compile is minutes; reruns are free)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
import sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.projections import project_bound
from ilqr_admm_tpu.solvers.batched import make_batched_lqt_admm
from ilqr_admm_tpu.ops.pallas_admm import make_pallas_lqt_admm
from ilqr_admm_tpu.utils.cost_assembly import viapoint_cost

N=100; BATCH=16384; ITERS=100
plant = DoubleIntegrator(1,2,dt=1.0/N)
d,m = plant.x_dim, plant.u_dim
zs = jnp.stack([jnp.zeros(d), jnp.asarray([1.,0.])]).astype(jnp.float32)
Qs = jnp.stack([jnp.zeros((d,d)), jnp.eye(d)*1e3]).astype(jnp.float32)
seq = np.zeros(N,dtype=np.int32); seq[-1]=1
cost = viapoint_cost(zs,Qs,seq,1e-2,m)
A,B = plant.AB(N); A=A.astype(jnp.float32); B=B.astype(jnp.float32)
rng = np.random.default_rng(0)
x0s = jnp.asarray(rng.normal(0,0.1,size=(BATCH,d)),jnp.float32)

solve_x = make_batched_lqt_admm(A,B,cost,project_u=lambda u: project_bound(u,-5.,5.),rho_u=1e-2,n_iters=ITERS)
x_ref,u_ref = solve_x(x0s); jax.block_until_ready(u_ref)
t0=time.perf_counter(); reps=5
for _ in range(reps): x_ref,u_ref = solve_x(x0s)
jax.block_until_ready(u_ref); dt=(time.perf_counter()-t0)/reps
print(f"XLA:    {dt*1e3:.2f} ms → {BATCH*ITERS/dt/1e6:.1f}M iters/s, max|u| {float(jnp.max(jnp.abs(u_ref))):.4f}")

for tile in [256, 512, 1024]:
    solve_p = make_pallas_lqt_admm(A,B,cost,u_lower=-5.,u_upper=5.,rho_u=1e-2,n_iters=ITERS,batch_tile=tile)
    x_p,u_p,zx,zu = solve_p(x0s); jax.block_until_ready(u_p)
    t0=time.perf_counter()
    for _ in range(reps): x_p,u_p,zx,zu = solve_p(x0s)
    jax.block_until_ready(u_p); dt=(time.perf_counter()-t0)/reps
    err = float(jnp.max(jnp.abs(u_p-u_ref)))
    print(f"Pallas tile={tile}: {dt*1e3:.2f} ms → {BATCH*ITERS/dt/1e6:.1f}M iters/s, max|u| {float(jnp.max(jnp.abs(u_p))):.4f}, vs-XLA err {err:.2e}")
    # MFU: useful work per instance-iteration = the (Nm)x(Nm) response
    # GEMM (2*Nm^2 FLOPs); issued = 3 bf16 passes; Nm=100 pads to 128
    # lanes in both GEMM dims
    from mfu import lane_pad, report
    print("        " + report(BATCH*ITERS/dt, 2.0*(N*m)**2, issued_factor=3.0,
                              pad_factor=lane_pad(N*m)**2))
