"""Quantify the gap between true device time (fori-loop-chained forward)
and bench.py's dispatch-per-iteration wall time at 32k.

If chained R-rep time/R << bench per-iter time, the bench is dispatch-bound
(tunnel RPC / host overhead), not device-bound — the fix is batching steps
per dispatch, not faster kernels.
"""
import os
import time

import numpy as np

import scenesplat_tpu

scenesplat_tpu.setup_compilation_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import FLAGSHIP_BACKBONE, _make_inputs
from scenesplat_tpu.models import PointBatch, build_model
from scenesplat_tpu.models.ptv3 import PointTransformerV3

N = int(os.environ.get("SCENESPLAT_PROBE_N", 32768))
R = int(os.environ.get("SCENESPLAT_PROBE_R", 8))
backbone = dict(FLAGSHIP_BACKBONE, dtype=jnp.bfloat16)
model = build_model(dict(type="LangPretrainer", backbone=backbone))
rng = np.random.default_rng(0)
coord, feat, grid_coord, mask = _make_inputs(rng, 1, N)
point = PointBatch(
    coord=jnp.asarray(coord), feat=jnp.asarray(feat),
    grid_coord=jnp.asarray(grid_coord), mask=jnp.asarray(mask),
)
bb = PointTransformerV3(**{k: v for k, v in backbone.items() if k != "type"})

geom_fused = jax.jit(bb.build_geometry)
g = geom_fused(point)

variables = jax.jit(
    lambda p, gg: model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        p, train=False, geometry=gg,
    )
)(point, g)


def timed(fn, *args, iters=5):
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@jax.jit
def noop(x):
    return x * 1.000001


t_floor = timed(noop, jnp.zeros((), jnp.float32))
print(f"floor {t_floor*1e3:7.2f} ms", flush=True)


# (a) true device time: R forwards chained through a data-dependent carry
@jax.jit
def fwd_chain(v, p, gg):
    def body(i, f):
        pt = p.replace(feat=f)
        out = model.apply(v, pt, train=False, geometry=gg).feat
        return f * 0.5 + out[..., : f.shape[-1]].astype(f.dtype) * 0.01

    f = jax.lax.fori_loop(0, R, body, p.feat)
    return jnp.sum(f.astype(jnp.float32))


t_chain = (timed(fwd_chain, variables, point, g) - t_floor) / R
print(f"chained net fwd:   {t_chain*1e3:8.2f} ms/iter "
      f"({N/t_chain:,.0f} gaussians/s device-only)", flush=True)


# (b) single-dispatch network (one fetch per call: includes 1 RPC)
@jax.jit
def fwd1(v, p, gg):
    return jnp.sum(model.apply(v, p, train=False, geometry=gg).feat.astype(jnp.float32))


t_one = timed(fwd1, variables, point, g)
print(f"per-dispatch net:  {t_one*1e3:8.2f} ms (incl 1 RPC)", flush=True)

# (c) bench-style loop: dispatch iters ahead, one fetch at the end
for iters in (10,):
    float(fwd1(variables, point, g))
    t0 = time.perf_counter()
    sums = [fwd1(variables, point, g) for _ in range(iters)]
    total = float(jnp.sum(jnp.stack(sums)))
    dt = (time.perf_counter() - t0) / iters
    print(f"bench-style loop:  {dt*1e3:8.2f} ms/iter "
          f"({N/dt:,.0f} gaussians/s) [{iters} iters]", flush=True)

# (d) geometry fused, chained. Geometry consumes only grid_coord/mask, so
# the perturbation must hit grid_coord with a data-dependent (unfoldable)
# zero or while-LICM hoists the whole geometry subgraph out of the loop.
@jax.jit
def geom_chain(p):
    def body(i, c):
        z = (c * 1e-30).astype(p.grid_coord.dtype)
        gg = bb.build_geometry(p.replace(grid_coord=p.grid_coord + z))
        leaves = [x for x in jax.tree_util.tree_leaves(gg)
                  if hasattr(x, "astype")]
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return c + s * 1e-30

    return jax.lax.fori_loop(0, R, body, jnp.zeros((), jnp.float32))


t_geom = (timed(geom_chain, point) - t_floor) / R
print(f"chained geometry:  {t_geom*1e3:8.2f} ms/iter", flush=True)

tot = t_chain + t_geom
print(f"device total:      {tot*1e3:8.2f} ms -> {N/tot:,.0f} gaussians/s",
      flush=True)
