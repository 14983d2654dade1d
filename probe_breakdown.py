"""Forward-time breakdown at 32k: staged geometry pieces vs network program."""
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
jax.block_until_ready(g)

variables = jax.jit(
    lambda p, gg: model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        p, train=False, geometry=gg,
    )
)(point, g)


@jax.jit
def fwd(v, p, gg):
    return model.apply(v, p, train=False, geometry=gg).feat


out = fwd(variables, point, g)
out.block_until_ready()


def timeit(fn, iters=10):
    # sync via scalar host fetch: block_until_ready is a NO-OP on the
    # tunneled runtime; per-call timings then measure only the dispatch
    # backpressure. A reduced-to-scalar fetch forces true completion.
    def sync():
        out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves if hasattr(l, "astype")))

    sync()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


t_geom = timeit(lambda: geom_fused(point))
t_net = timeit(lambda: fwd(variables, point, g))
t_both = timeit(lambda: fwd(variables, point, geom_fused(point)))

# staged geometry for comparison (per-program dispatch overhead)
g2 = bb.build_geometry_staged(point)
jax.block_until_ready(g2)
t_geom_staged = timeit(lambda: bb.build_geometry_staged(point))

print(f"geom fused:  {t_geom*1e3:8.1f} ms")
print(f"geom staged: {t_geom_staged*1e3:8.1f} ms")
print(f"network:     {t_net*1e3:8.1f} ms")
print(f"geom+net:    {t_both*1e3:8.1f} ms -> {N/t_both:,.0f} gaussians/s")
