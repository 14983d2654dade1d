"""Geometry sub-stage breakdown at a given N: serialization vs stem plan vs
per-stage pooling/conv plans. Scratch probe (not part of the test suite)."""
import sys
import time

import numpy as np

import scenesplat_tpu

scenesplat_tpu.setup_compilation_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import FLAGSHIP_BACKBONE, _make_inputs
from scenesplat_tpu.models import PointBatch
from scenesplat_tpu.models.ptv3 import PointTransformerV3
from scenesplat_tpu.ops.subm_conv import build_subm_conv_plan, subplan
from scenesplat_tpu.ops.segops import build_pooling_plan, pool_values
from scenesplat_tpu.ops.serialization import take_along_points
from scenesplat_tpu.ops.segops import pool_serialization

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
backbone = dict(FLAGSHIP_BACKBONE, dtype=jnp.bfloat16)
bb = PointTransformerV3(**{k: v for k, v in backbone.items() if k != "type"})
rng = np.random.default_rng(0)
coord, feat, grid_coord, mask = _make_inputs(rng, 1, N)
point = PointBatch(
    coord=jnp.asarray(coord), feat=jnp.asarray(feat),
    grid_coord=jnp.asarray(grid_coord), mask=jnp.asarray(mask),
)

orders = tuple(bb.order)
depth = bb.serialization_depth


@jax.jit
def do_serialize(p):
    return p.serialized(orders, depth=depth, shuffle_rng=None)


p_ser = do_serialize(point)
jax.block_until_ready(p_ser)


def zs(ser):
    zi = orders.index("z")
    return (ser.code_hi[zi], ser.code_lo[zi], ser.order[zi])


@jax.jit
def do_stem(p):
    return build_subm_conv_plan(p.grid_coord, p.mask, kernel_size=5,
                                depth=depth, z_sorted=zs(p.ser))


stem = do_stem(p_ser)
jax.block_until_ready(stem)

caps = bb.geometry_capacities(N)


@jax.jit
def do_pool_chain(p):
    import math
    state_ser, state_mask = p.ser, p.mask
    state_coord, state_grid = p.coord, p.grid_coord
    outs = []
    for s in range(1, 4):
        pooling_depth = 1
        plan = build_pooling_plan(state_ser, state_mask, caps[s - 1], pooling_depth)
        coord = pool_values(plan, state_coord, "mean")
        gridc = take_along_points(state_grid, plan.head_index) >> pooling_depth
        ser = pool_serialization(plan, state_ser, pooling_depth, packed=depth <= 10)
        cp = build_subm_conv_plan(gridc, plan.out_mask, kernel_size=3,
                                  depth=depth, z_sorted=zs(ser))
        state_ser, state_mask, state_coord, state_grid = ser, plan.out_mask, coord, gridc
        outs.append((plan, cp))
    return outs


chain = do_pool_chain(p_ser)
jax.block_until_ready(chain)


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


t_ser = timeit(lambda: do_serialize(point))
t_stem = timeit(lambda: do_stem(p_ser))
t_chain = timeit(lambda: do_pool_chain(p_ser))

print(f"N={N}")
print(f"serialize (4 curves): {t_ser*1e3:8.1f} ms")
print(f"stem k=5 plan:        {t_stem*1e3:8.1f} ms")
print(f"pool+conv chain x3:   {t_chain*1e3:8.1f} ms")
print(f"total:                {(t_ser+t_stem+t_chain)*1e3:8.1f} ms")
