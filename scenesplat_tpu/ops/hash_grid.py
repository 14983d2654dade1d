"""Hash-grid submanifold conv-plan builder for UNBOUNDED scenes.

Third neighbor-resolution strategy next to the sort-based merge-join
(ops/subm_conv.py:build_subm_conv_plan) and the dense voxel grid
(build_subm_conv_plan_dense). The dense path is ~10x faster than the join
on TPU but needs a static per-config extent; outdoor scenes
(HoliCity / KITTI-360: 100 m at 5 cm = 2000+ cells/axis) cannot afford the
dense buffer. This builder keeps the dense path's winning structure —
one scatter to build an index, contiguous narrow ROW gathers to read k
z-consecutive cells — but addresses it through a hash table over
"z-blocks" (columns of 8 consecutive z cells), so memory is O(N), not
O(extent^3), and the compile graph carries no join sort networks (flat
compile cost at any N, unlike the merge-join whose XLA sorts blow up the
tunneled compile helper at N >= 64k).

Reference parity: spconv.SubMConv3d resolves neighbors with a GPU hash
table (reference pointcept/models/point_transformer_v3/
point_transformer_v3m1_base.py:277-287,498-507). This is its TPU-native
analogue: device hash probes are rebuilt as lockstep scatter/gather
rounds because TPUs have no atomics — contention resolves through a
scatter-min claim, and probe loops are `lax.while_loop`s whose trip
count is bounded by the table's measured insertion displacement.

Structure
---------
- A "block" is one occupied (x, y, z>>3) cell-column: key
  ``(x + 1, y << 14 | (z>>3) + 1)`` (two int32s; 0 = empty sentinel),
  payload = 8 cell slots holding point ids (+1; 0 = empty).
- Table: ``T`` buckets x 4 block slots (T power of two). Insertion probes
  buckets linearly in lockstep rounds: gather the bucket's 4 keys ->
  match => placed; empty slot => claim it via scatter-min of a unique
  rank (winner writes the key, losers retry the same bucket next round);
  full & no match => advance one bucket. The max bucket displacement D
  over all insertions is tracked on device.
- Queries (k^2 columns x 2 z-blocks per point) probe the same chain,
  resolving on key match or on a bucket with an empty slot (no
  deletions, so the linear-probing invariant holds), and give up after
  D+1 buckets: any PRESENT key was inserted within D buckets of home,
  so stopping there is exact even when the chain is full of other keys.
  Found blocks read their 8 cells with one contiguous row gather; the k
  z-cells of a column are selected out of the 16 gathered cells with a
  take_along_axis on the minor axis.

Output is bit-identical to build_subm_conv_plan on one-point-per-voxel
inputs (GridSample's contract); duplicate-voxel inputs resolve
arbitrarily in both (and in spconv).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .subm_conv import SubMConvPlan, kernel_offsets

_U = jnp.uint32
_MAXI = np.int32(np.iinfo(np.int32).max)


def _next_pow2(v: int) -> int:
    return 1 << max(0, int(v - 1).bit_length())


def _hash_key(khi, klo, n_buckets: int):
    """murmur-style avalanche of the (khi, klo) block key -> bucket id."""
    h = khi.astype(_U) * _U(0x9E3779B1) ^ klo.astype(_U) * _U(0x85EBCA77)
    h = h ^ (h >> 15)
    h = h * _U(0x2C1B3C6D)
    h = h ^ (h >> 12)
    h = h * _U(0x297A2D39)
    h = h ^ (h >> 15)
    return (h & _U(n_buckets - 1)).astype(jnp.int32)


class HashGrid(NamedTuple):
    """Built table: keys [B*T, 8] (4 slots x (khi, klo)),
    cells [B*T*4, 8] (point ids + 1), max displacement D (scalar),
    n_buckets T (static)."""

    keys: jnp.ndarray
    cells: jnp.ndarray
    max_disp: jnp.ndarray
    n_buckets: int


def _block_key(x, y, z):
    return x + 1, ((y << 14) | ((z >> 3) + 1)).astype(jnp.int32)


def build_hash_grid(
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    table_buckets: int | None = None,
) -> HashGrid:
    """Insert every valid point's z-block into the bucketized hash table.

    ``table_buckets`` (power of two) defaults to >= N/2, i.e. slot load
    factor <= 0.5 (distinct blocks <= N). Termination is guaranteed while
    slots >= blocks; the lockstep loop runs until every valid point's
    block is placed or matched.
    """
    b, n = mask.shape
    if table_buckets is None:
        table_buckets = _next_pow2(max(64, (n + 1) // 2))
    t = int(table_buckets)
    assert t & (t - 1) == 0, "table_buckets must be a power of two"

    x = grid_coord[..., 0]
    y = grid_coord[..., 1]
    z = grid_coord[..., 2]
    khi, klo = _block_key(x, y, z)
    bucket0 = _hash_key(khi, klo, t)  # [B, N] local bucket
    batch_base = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0) * t
    rank = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n), 0) * n
        + jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    )

    keys = jnp.zeros((b * t, 8), jnp.int32)
    # loop state: local bucket, placed, slot (global block slot), disp
    state = (
        bucket0,
        ~mask,
        jnp.zeros((b, n), jnp.int32),
        jnp.zeros((b, n), jnp.int32),
        keys,
        jnp.int32(0),
    )

    def cond(s):
        _, placed, _, _, _, it = s
        return jnp.any(~placed) & (it < 4 * t + 8)

    def body(s):
        bucket, placed, slot, disp, keys, it = s
        gbucket = batch_base + bucket
        rows = keys.at[gbucket].get(mode="promise_in_bounds")  # [B, N, 8]
        skhi = rows[..., 0::2]  # [B, N, 4]
        sklo = rows[..., 1::2]
        match = (skhi == khi[..., None]) & (sklo == klo[..., None])
        any_match = jnp.any(match, axis=-1)
        match_j = jnp.argmax(match, axis=-1).astype(jnp.int32)
        empty = skhi == 0
        any_empty = jnp.any(empty, axis=-1)
        empty_j = jnp.argmax(empty, axis=-1).astype(jnp.int32)

        live = ~placed
        # 1) match -> placed at the matched slot
        newly = live & any_match
        slot = jnp.where(newly, gbucket * 4 + match_j, slot)
        placed = placed | newly
        live = live & ~any_match

        # 2) empty slot -> contend for the first one via scatter-min rank
        contend = live & any_empty
        cslot = gbucket * 4 + empty_j
        claim = jnp.full((b * t * 4 + 1,), _MAXI, jnp.int32)
        claim = claim.at[jnp.where(contend, cslot, b * t * 4)].min(
            rank, mode="drop"
        )
        won = contend & (
            claim.at[jnp.minimum(cslot, b * t * 4)].get(
                mode="promise_in_bounds"
            )
            == rank
        )
        flat_keys = keys.reshape(-1)
        # [B*T, 8] flattens so slot j's key pair sits at 8*gbucket + 2j
        kidx = gbucket * 8 + empty_j * 2
        flat_keys = flat_keys.at[
            jnp.where(won, kidx, b * t * 8)
        ].set(khi, mode="drop")
        flat_keys = flat_keys.at[
            jnp.where(won, kidx + 1, b * t * 8)
        ].set(klo, mode="drop")
        keys = flat_keys.reshape(b * t, 8)
        slot = jnp.where(won, cslot, slot)
        placed = placed | won
        # losers of the claim retry the SAME bucket next round

        # 3) full bucket, no match -> advance
        advance = live & ~any_empty
        bucket = jnp.where(advance, (bucket + 1) & (t - 1), bucket)
        disp = disp + advance.astype(jnp.int32)
        return bucket, placed, slot, disp, keys, it + 1

    bucket, placed, slot, disp, keys, _ = jax.lax.while_loop(cond, body, state)

    # scatter cells: point id + 1 at block_slot * 8 + (z & 7)
    cells = jnp.zeros((b * t * 4 * 8 + 1,), jnp.int32)
    cidx = jnp.where(mask & placed, slot * 8 + (z & 7), b * t * 32)
    pid = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1) + 1
    cells = cells.at[cidx].set(pid, mode="drop")[:-1].reshape(b * t * 4, 8)

    max_disp = jnp.max(jnp.where(mask, disp, 0))
    return HashGrid(keys=keys, cells=cells, max_disp=max_disp, n_buckets=t)


def lookup_blocks(grid: HashGrid, khi, klo, batch_base):
    """Probe block keys -> (found, global block slot). Lockstep rounds
    bounded by the table's insertion displacement (exactness: see module
    docstring). ``batch_base`` = scene index * n_buckets, broadcastable
    to the key shape."""
    t = grid.n_buckets
    bucket = _hash_key(khi, klo, t)
    shape = bucket.shape
    state = (
        bucket,
        jnp.zeros(shape, bool),  # resolved
        jnp.full(shape, -1, jnp.int32),  # slot
        jnp.zeros(shape, jnp.int32),  # disp
    )

    def cond(s):
        _, resolved, _, _ = s
        return jnp.any(~resolved)

    def body(s):
        bucket, resolved, slot, disp = s
        gbucket = batch_base + bucket
        rows = grid.keys.at[gbucket].get(mode="promise_in_bounds")
        skhi = rows[..., 0::2]
        sklo = rows[..., 1::2]
        match = (skhi == khi[..., None]) & (sklo == klo[..., None])
        any_match = jnp.any(match, axis=-1)
        match_j = jnp.argmax(match, axis=-1).astype(jnp.int32)
        any_empty = jnp.any(skhi == 0, axis=-1)

        live = ~resolved
        found_now = live & any_match
        slot = jnp.where(found_now, gbucket * 4 + match_j, slot)
        # chain ends: match, an empty slot (key would have been here), or
        # displacement exceeding the worst insertion displacement
        done = live & (any_match | any_empty | (disp >= grid.max_disp))
        resolved = resolved | done
        advance = live & ~done
        bucket = jnp.where(advance, (bucket + 1) & (t - 1), bucket)
        disp = disp + advance.astype(jnp.int32)
        return bucket, resolved, slot, disp

    _, _, slot, _ = jax.lax.while_loop(cond, body, state)
    return slot >= 0, slot


def build_subm_conv_plan_hash(
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    kernel_size: int = 3,
    depth: int = 16,
    table_buckets: int | None = None,
    grid: HashGrid | None = None,
) -> SubMConvPlan:
    """grid_coord [B, N, 3] int32 (non-negative, < 2**depth), mask [B, N].

    Pass a prebuilt ``grid`` (from build_hash_grid) to share one table
    across the stem k=5 and xCPE k=3 plans of a stage — mirroring the
    reference's spconv ``indice_key`` sharing, and the z-sort reuse of the
    merge-join path.
    """
    assert kernel_size % 2 == 1
    assert kernel_size <= 9, (
        "the z-span [z-r, z+r] must fit two 8-cell z-blocks (k <= 9); "
        "larger kernels would need a third probed block"
    )
    assert depth <= 16, "block keys pack y<<14 | zb+1; depth > 16 overflows"
    b, n = mask.shape
    k = kernel_size
    r = k // 2
    limit = jnp.int32((1 << depth) - 1)
    if grid is None:
        grid = build_hash_grid(grid_coord, mask, table_buckets)
    t = grid.n_buckets

    x = grid_coord[..., 0]
    y = grid_coord[..., 1]
    z = grid_coord[..., 2]

    offs = kernel_offsets(k)  # product order: dx outer, dy, dz inner
    cols = [(dx, dy) for dx in range(-r, r + 1) for dy in range(-r, r + 1)]
    qx = x[:, None, :] + jnp.asarray([c[0] for c in cols], jnp.int32)[None, :, None]
    qy = y[:, None, :] + jnp.asarray([c[1] for c in cols], jnp.int32)[None, :, None]
    # the k z-cells [z-r, z+r] span exactly two 8-cell z-blocks zb0, zb0+1
    # (k <= 9); zb0 floors for negative z-r, and the +1 in the key keeps
    # out-of-range blocks from ever matching a stored key
    zlo = z - r
    zb0 = zlo >> 3  # [B, N]
    kq_hi = (qx + 1)[..., None]  # [B, K2, N, 1]
    zb = jnp.stack([zb0, zb0 + 1], axis=-1)[:, None]  # [B, 1, N, 2]
    kq_lo = ((qy[..., None] << 14) | (zb + 1)).astype(jnp.int32)
    kq_hi = jnp.broadcast_to(kq_hi, kq_lo.shape)

    batch_base = (
        jax.lax.broadcasted_iota(jnp.int32, kq_lo.shape, 0) * t
    )
    found, slot = lookup_blocks(grid, kq_hi, kq_lo, batch_base)

    rows = grid.cells.at[jnp.maximum(slot, 0)].get(
        mode="promise_in_bounds"
    )  # [B, K2, N, 2, 8]
    rows = jnp.where(found[..., None], rows, 0)
    cells16 = rows.reshape(b, len(cols), n, 16)

    # column c, offset dz: cell at index (z - r - zb0*8) + (dz + r) in the
    # 16 gathered cells
    j0 = (zlo - (zb0 << 3))[:, None, :, None]  # [B, 1, N, 1] in [0, 7]
    jidx = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, k), 3)
    picked = jnp.take_along_axis(
        cells16, jnp.broadcast_to(jidx, (b, len(cols), n, k)), axis=-1
    )  # [B, K2, N, k]

    qz = z[:, None, :, None] + jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, k), 3
    ) - r
    in_range = (
        (qx[..., None] >= 0) & (qx[..., None] <= limit)
        & (qy[..., None] >= 0) & (qy[..., None] <= limit)
        & (qz >= 0) & (qz <= limit)
        & mask[:, None, :, None]
    )
    valid = in_range & (picked > 0)
    # [B, K2, N, k] -> [B, K3, N] in kernel_offsets product order
    nbr = jnp.moveaxis(picked - 1, -1, 2).reshape(b, len(offs), n)
    vld = jnp.moveaxis(valid, -1, 2).reshape(b, len(offs), n)
    return SubMConvPlan(
        neighbor_index=jnp.maximum(nbr, 0).astype(jnp.int32),
        neighbor_valid=vld,
        kernel_size=k,
    )
