"""Hash-grid conv-plan builder vs the sort-based merge-join (exactness).

The hash path (ops/hash_grid.py) must produce bit-identical plans to
build_subm_conv_plan on one-point-per-voxel inputs — including unbounded
coordinate extents the dense builder cannot afford, padded rows, and
overloaded tables that force multi-bucket probe chains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenesplat_tpu.ops.hash_grid import (
    build_hash_grid,
    build_subm_conv_plan_hash,
)
from scenesplat_tpu.ops.subm_conv import build_subm_conv_plan, subplan


def _unique_coords(rng, b, n, extent, depth_limit=None):
    """[B, N, 3] int32 with no duplicate voxels per scene."""
    out = np.zeros((b, n, 3), np.int32)
    for i in range(b):
        seen = set()
        pts = []
        while len(pts) < n:
            c = tuple(int(v) for v in rng.integers(0, extent, 3))
            if c not in seen:
                seen.add(c)
                pts.append(c)
        out[i] = np.asarray(pts, np.int32)
    return out


def _assert_plans_equal(got, ref):
    np.testing.assert_array_equal(
        np.asarray(got.neighbor_valid), np.asarray(ref.neighbor_valid)
    )
    v = np.asarray(ref.neighbor_valid)
    np.testing.assert_array_equal(
        np.asarray(got.neighbor_index)[v], np.asarray(ref.neighbor_index)[v]
    )


@pytest.mark.parametrize("kernel_size", [3, 5])
@pytest.mark.parametrize("extent", [12, 40000])
def test_hash_plan_matches_join(kernel_size, extent):
    """Dense-ish (12^3, heavy neighbor hits) and outdoor-scale (40000/axis,
    far beyond any dense extent) coordinates."""
    rng = np.random.default_rng(7 + kernel_size + extent)
    b, n = 2, 256
    coords = _unique_coords(rng, b, n, extent)
    mask = np.ones((b, n), bool)
    mask[1, 200:] = False  # padded tail (coords there are live-looking)
    gc = jnp.asarray(coords)
    mk = jnp.asarray(mask)

    ref = build_subm_conv_plan(gc, mk, kernel_size=kernel_size, depth=16)
    got = build_subm_conv_plan_hash(gc, mk, kernel_size=kernel_size, depth=16)
    _assert_plans_equal(got, ref)


def test_hash_plan_overloaded_table():
    """Tiny table (load factor near 1) forces long displacement chains;
    the D-bounded query must stay exact."""
    rng = np.random.default_rng(3)
    b, n = 1, 300
    coords = _unique_coords(rng, b, n, 9)  # 9^3=729 voxels, dense occupancy
    mask = np.ones((b, n), bool)
    gc = jnp.asarray(coords)
    mk = jnp.asarray(mask)

    # ~160 distinct z-blocks into 64 buckets x 4 = 256 slots (load ~0.6):
    # some bucket overflows its 4 slots, forcing multi-bucket chains
    grid = build_hash_grid(gc, mk, table_buckets=64)
    assert int(grid.max_disp) >= 1  # the stress did force displacement

    ref = build_subm_conv_plan(gc, mk, kernel_size=3, depth=16)
    got = build_subm_conv_plan_hash(gc, mk, kernel_size=3, depth=16, grid=grid)
    _assert_plans_equal(got, ref)


def test_hash_grid_shared_across_kernels():
    """One table serves the k=5 stem plan and the k=3 xCPE plan (the
    spconv indice_key-sharing analogue), and the k=3 hash plan equals
    subplan(k5_plan, 3)."""
    rng = np.random.default_rng(11)
    b, n = 2, 192
    coords = _unique_coords(rng, b, n, 25)
    mask = np.ones((b, n), bool)
    mask[0, 150:] = False
    gc = jnp.asarray(coords)
    mk = jnp.asarray(mask)

    grid = build_hash_grid(gc, mk)
    k5 = build_subm_conv_plan_hash(gc, mk, kernel_size=5, grid=grid)
    k3 = build_subm_conv_plan_hash(gc, mk, kernel_size=3, grid=grid)
    _assert_plans_equal(k3, subplan(k5, 3))
    ref5 = build_subm_conv_plan(gc, mk, kernel_size=5, depth=16)
    _assert_plans_equal(k5, ref5)


def test_hash_plan_boundary_coords():
    """Coords hugging 0 and the depth limit: negative/overflow z-blocks and
    out-of-range columns must resolve to invalid, never to a false match."""
    depth = 10
    lim = (1 << depth) - 1
    coords = np.asarray(
        [[[0, 0, 0], [0, 0, 1], [1, 0, 0], [0, 1, 0],
          [lim, lim, lim], [lim, lim, lim - 1], [lim - 1, lim, lim],
          [5, 5, 5]]],
        np.int32,
    )
    mask = np.ones((1, coords.shape[1]), bool)
    gc = jnp.asarray(coords)
    mk = jnp.asarray(mask)
    for k in (3, 5):
        ref = build_subm_conv_plan(gc, mk, kernel_size=k, depth=depth)
        got = build_subm_conv_plan_hash(gc, mk, kernel_size=k, depth=depth)
        _assert_plans_equal(got, ref)


def test_hash_plan_jits():
    """The full build (insert while_loop + query while_loop) compiles as
    one program with static shapes."""
    rng = np.random.default_rng(5)
    coords = _unique_coords(rng, 1, 128, 1000)
    gc = jnp.asarray(coords)
    mk = jnp.ones((1, 128), bool)

    @jax.jit
    def f(gc, mk):
        p = build_subm_conv_plan_hash(gc, mk, kernel_size=3)
        return p.neighbor_index, p.neighbor_valid

    nbr, vld = f(gc, mk)
    ref = build_subm_conv_plan(gc, mk, kernel_size=3, depth=16)
    np.testing.assert_array_equal(np.asarray(vld), np.asarray(ref.neighbor_valid))
    v = np.asarray(ref.neighbor_valid)
    np.testing.assert_array_equal(
        np.asarray(nbr)[v], np.asarray(ref.neighbor_index)[v]
    )


def test_hash_plan_sharded_data_parallel():
    """The build (insert/query while_loops + scatters) must compile and stay
    exact when the batch is sharded over the virtual 8-device 'data' mesh —
    scatter/gather indices never cross scene slabs, so GSPMD can partition
    the [B*T, ...] table buffers along with the batch."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scenesplat_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(23)
    b, n = 8, 192
    coords = _unique_coords(rng, b, n, 3000)
    mask = np.ones((b, n), bool)
    mask[3, 150:] = False
    gc = jnp.asarray(coords)
    mk = jnp.asarray(mask)

    mesh = create_mesh(len(jax.devices()))
    shard = NamedSharding(mesh, P("data"))
    gc_s = jax.device_put(gc, NamedSharding(mesh, P("data", None, None)))
    mk_s = jax.device_put(mk, NamedSharding(mesh, P("data", None)))

    @jax.jit
    def f(gc, mk):
        p = build_subm_conv_plan_hash(gc, mk, kernel_size=3)
        return p.neighbor_index, p.neighbor_valid

    nbr, vld = f(gc_s, mk_s)
    ref = build_subm_conv_plan(gc, mk, kernel_size=3, depth=16)
    v = np.asarray(ref.neighbor_valid)
    np.testing.assert_array_equal(np.asarray(vld), v)
    np.testing.assert_array_equal(
        np.asarray(nbr)[v], np.asarray(ref.neighbor_index)[v]
    )
