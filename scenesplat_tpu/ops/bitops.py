"""48-bit code arithmetic on uint32 pairs.

Space-filling-curve codes need up to 3*16 = 48 bits (reference:
pointcept/models/utils/structure.py:64-74 limits serialization depth to 16).
Rather than enabling global x64 in JAX (which changes default dtypes and hurts
TPU performance), codes are carried as a pair of uint32 lanes:

    ``hi`` = bits [24, 48)     ``lo`` = bits [0, 24)

Each lane holds at most 24 bits, so lexicographic comparison of (hi, lo) is
exactly comparison of the 48-bit value, and ``jax.lax.sort(..., num_keys=2)``
sorts codes natively on TPU. A sentinel ``hi`` above 2**24 marks padding and
sorts after every real code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_sort import sort_rows

MASK24 = np.uint32(0x00FFFFFF)  # numpy, not jnp: importing must not init the backend
# Padding sentinel: larger than any valid 24-bit hi lane, survives >>3 shifts.
SENTINEL_HI = np.uint32(0x7FFFFFFF)
# Packed-key sentinel: strictly below 0xFFFFFFFF, which the Pallas bitonic
# sort reserves for its power-of-two padding slots (ops/pallas_sort.py).
SENTINEL_PACKED = np.uint32(0xFFFFFFFE)


def pair_shift_right(hi: jnp.ndarray, lo: jnp.ndarray, k: int):
    """Logical right shift of the 48-bit (hi, lo) pair by static ``k`` bits."""
    if k == 0:
        return hi, lo
    if k < 24:
        new_hi = hi >> k
        new_lo = ((lo >> k) | (hi << (24 - k))) & MASK24
    else:
        new_hi = jnp.zeros_like(hi)
        new_lo = (hi >> (k - 24)) & MASK24
    return new_hi, new_lo


def pair_xor(ahi, alo, bhi, blo):
    return ahi ^ bhi, alo ^ blo


def pair_less(ahi, alo, bhi, blo):
    """a < b for 48-bit pairs."""
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def pair_equal(ahi, alo, bhi, blo):
    return (ahi == bhi) & (alo == blo)


def spread3_u8(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 8 bits of ``v`` so bit i lands at bit 3*i (24-bit out)."""
    v = v.astype(jnp.uint32) & jnp.uint32(0xFF)
    v = (v | (v << 8)) & jnp.uint32(0x00F00F)
    v = (v | (v << 4)) & jnp.uint32(0x0C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x249249)
    return v


def compact3_u8(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`spread3_u8`: collect every 3rd bit into low 8 bits."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x249249)
    v = (v | (v >> 2)) & jnp.uint32(0x0C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0x0000FF)
    return v


def interleave3_pair(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, depth: int):
    """Bit-interleave three ``depth``-bit coords, x highest per triple.

    Bit i of x -> output bit 3i+2, y -> 3i+1, z -> 3i (matching the reference
    z-order layout, pointcept/models/utils/serialization/z_order.py:40-50).
    Returns the 48-bit code as a (hi, lo) uint32 pair.
    """
    assert 0 < depth <= 16
    x = x.astype(jnp.uint32) & jnp.uint32((1 << depth) - 1)
    y = y.astype(jnp.uint32) & jnp.uint32((1 << depth) - 1)
    z = z.astype(jnp.uint32) & jnp.uint32((1 << depth) - 1)
    lo = (spread3_u8(x) << 2) | (spread3_u8(y) << 1) | spread3_u8(z)
    if depth > 8:
        hi = (
            (spread3_u8(x >> 8) << 2)
            | (spread3_u8(y >> 8) << 1)
            | spread3_u8(z >> 8)
        )
    else:
        hi = jnp.zeros_like(lo)
    return hi, lo


def deinterleave3_pair(hi: jnp.ndarray, lo: jnp.ndarray):
    """Inverse of :func:`interleave3_pair`; returns (x, y, z) int32."""
    x = compact3_u8(lo >> 2) | (compact3_u8(hi >> 2) << 8)
    y = compact3_u8(lo >> 1) | (compact3_u8(hi >> 1) << 8)
    z = compact3_u8(lo) | (compact3_u8(hi) << 8)
    return x.astype(jnp.int32), y.astype(jnp.int32), z.astype(jnp.int32)


def pair_prefix_xor(hi: jnp.ndarray, lo: jnp.ndarray, total_bits: int):
    """Gray -> binary decode: v ^= v >> s for s = 1, 2, 4, ... < total_bits.

    Operates on the 48-bit pair; high bits above ``total_bits`` must be zero.
    """
    shift = 1
    while shift < total_bits:
        shi, slo = pair_shift_right(hi, lo, shift)
        hi, lo = hi ^ shi, lo ^ slo
        shift *= 2
    return hi, lo


def lexsort_pair(hi: jnp.ndarray, lo: jnp.ndarray, axis: int = -1, packed: bool = False):
    """Sort 48-bit pairs along ``axis``.

    Returns (sorted_hi, sorted_lo, order) where ``order`` holds the source
    index of each sorted slot (int32). With ``packed=True`` (codes known to
    fit the lo lane, i.e. serialization depth <= 10 so 3*depth <= 30 bits and
    hi == 0 for all real codes) the hi lane is skipped: a 1-key sort is
    measurably cheaper on TPU and covers the common 2 cm / room-scale case.
    """
    axis = axis % hi.ndim
    assert axis == hi.ndim - 1, "pallas-backed sort requires last-axis"
    iota = jax.lax.broadcasted_iota(jnp.int32, hi.shape, axis)
    # is_stable=False: stability is never required (ties = same voxel) and
    # stable variadic sorts compile ~20-50x slower on the TPU toolchain
    if packed:
        # depth <= 10 -> 3*depth <= 30 bits, but the (hi, lo) lanes split at
        # bit 24: coords >= 256 carry code bits [24, 30) in hi (<= 0x3F).
        # Pack the FULL code into one u32; only the padding sentinel
        # (SENTINEL_HI, far above 0x3F) folds to the packed sentinel.
        key = jnp.where(hi > jnp.uint32(0x3F), SENTINEL_PACKED, (hi << 24) | lo)
        sorted_key, order = sort_rows((key, iota), num_keys=1)
        is_pad = sorted_key == SENTINEL_PACKED
        sorted_hi = jnp.where(is_pad, SENTINEL_HI, sorted_key >> 24)
        sorted_lo = jnp.where(is_pad, 0, sorted_key & MASK24)
        return sorted_hi.astype(jnp.uint32), sorted_lo.astype(jnp.uint32), order
    sorted_hi, sorted_lo, order = sort_rows((hi, lo, iota), num_keys=2)
    return sorted_hi, sorted_lo, order


def invert_order(order: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Given a permutation ``order`` (sorted slot -> source index), return the
    inverse permutation (source index -> sorted slot)."""
    axis = axis % order.ndim
    assert axis == order.ndim - 1, "pallas-backed sort requires last-axis"
    iota = jax.lax.broadcasted_iota(jnp.int32, order.shape, axis)
    # inverse[order[j]] = j, per batch slice: sort by order as key.
    _, inverse = sort_rows((order, iota), num_keys=1)
    return inverse


def searchsorted_pair(
    data_hi: jnp.ndarray,
    data_lo: jnp.ndarray,
    query_hi: jnp.ndarray,
    query_lo: jnp.ndarray,
) -> jnp.ndarray:
    """Vectorized lower-bound binary search over sorted 48-bit pairs.

    ``data_*``: sorted arrays of shape [N]. ``query_*``: any shape. Returns the
    first index where data >= query (in [0, N]). Branchless fixed-trip-count
    loop so it stays jit/vmap friendly. This is the TPU-native replacement for
    the reference's spconv hash-table voxel lookup.
    """
    n = data_hi.shape[0]
    n_iter = max(1, (n).bit_length())

    left = jnp.zeros(query_hi.shape, jnp.int32)
    right = jnp.full(query_hi.shape, n, jnp.int32)

    def body(_, carry):
        left, right = carry
        active = left < right
        mid = (left + right) // 2
        mid_c = jnp.clip(mid, 0, n - 1)
        mhi = data_hi[mid_c]
        mlo = data_lo[mid_c]
        less = pair_less(mhi, mlo, query_hi, query_lo)  # data[mid] < query
        new_left = jnp.where(less, mid + 1, left)
        new_right = jnp.where(less, right, mid)
        left = jnp.where(active, new_left, left)
        right = jnp.where(active, new_right, right)
        return left, right

    left, right = jax.lax.fori_loop(0, n_iter + 1, body, (left, right))
    return left


def lookup_pair_batched(
    data_hi: jnp.ndarray,
    data_lo: jnp.ndarray,
    query_hi: jnp.ndarray,
    query_lo: jnp.ndarray,
    data_payload: jnp.ndarray | None = None,
    packed: bool = False,
):
    """Exact-match lookup of 48-bit queries in sorted data via merge-join.

    data [B, N] (rows sorted ascending), queries [B, ...] ->
    (payload, found): per query, the matched data entry's ``data_payload``
    value (default: its sorted position) and a found flag.

    TPU rationale: binary search needs log2(N) *sequential scalar gathers*,
    which lower to element-at-a-time DMA (~250 ms for 880k queries measured
    on v5e). A merge-join is two cheap vectorized sorts plus a "latest data
    entry" associative scan — no gathers at all. The payload rides the scan,
    so even the result gather is free. This mirrors
    jnp.searchsorted(method='sort'), generalized to 2-word keys, batch, and
    payload propagation.
    """
    b, n = data_hi.shape
    qshape = query_hi.shape
    m = int(np.prod(qshape[1:])) if qshape[1:] else 1
    qhi = query_hi.reshape(b, m)
    qlo = query_lo.reshape(b, m)
    if data_payload is None:
        data_payload = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    if packed:
        return _lookup_packed(
            data_hi, data_lo, qhi, qlo, data_payload, qshape
        )

    # Rebalance the 48-bit (hi, lo) key one bit left and fold the data/query
    # flag into the new LSB (data 0 < query 1, so a query's predecessor chain
    # contains its match): khi' = hi<<1 | lo>>31 (hi uses <= 16 bits, no
    # overflow), klo' = lo<<1 | flag. As in the packed path, a slot needs
    # EITHER its qid (query) OR its payload (data), so one aux lane carries
    # both — a 3-operand 2-key sort instead of 5-operand 3-key, and the
    # second sort keys on aux directly (data aux >= 2^30 sorts last).
    assert m < (1 << 30) and n < (1 << 30)
    hi_all = jnp.concatenate([data_hi, qhi], axis=-1)
    lo_all = jnp.concatenate([data_lo, qlo], axis=-1)
    flag = jnp.concatenate(
        [jnp.zeros((b, n), jnp.uint32), jnp.ones((b, m), jnp.uint32)], axis=-1
    )
    khi = (hi_all << 1) | (lo_all >> 31)
    klo = (lo_all << 1) | flag
    data_bit = jnp.uint32(1) << 30
    aux = jnp.concatenate(
        [
            data_payload.astype(jnp.uint32) | data_bit,
            jax.lax.broadcasted_iota(jnp.uint32, (b, m), 1),
        ],
        axis=-1,
    )
    shi, slo, saux = sort_rows((khi, klo, aux), num_keys=2)

    is_data = (slo & jnp.uint32(1)) == 0

    # "latest data entry before me" scan: key lanes for the equality check,
    # payload lane for the result, has_data lane for validity
    def combine(a, bb):
        ahi, alo, apay, ad = a
        bhi, blo, bpay, bd = bb
        return (
            jnp.where(bd, bhi, ahi),
            jnp.where(bd, blo, alo),
            jnp.where(bd, bpay, apay),
            ad | bd,
        )

    code_lo = slo >> 1 | (shi << 31)  # undo the rebalance: low 32 code bits
    code_hi = shi >> 1
    lhi, llo, lpay, has_data = jax.lax.associative_scan(
        combine,
        (
            jnp.where(is_data, code_hi, 0),
            jnp.where(is_data, code_lo, 0),
            jnp.where(is_data, saux & (data_bit - 1), 0),
            is_data,
        ),
        axis=-1,
    )
    found_sorted = (
        has_data & pair_equal(lhi, llo, code_hi, code_lo) & ~is_data
    )

    val = lpay | (found_sorted.astype(jnp.uint32) << 31)
    _, val_q = sort_rows((saux, val), num_keys=1)
    out_pay = (val_q[:, :m] & (data_bit - 1)).astype(jnp.int32)
    found = (val_q[:, :m] >> 31) > 0
    return out_pay.reshape(qshape), found.reshape(qshape)


def _lookup_packed(data_hi, data_lo, qhi, qlo, data_payload, qshape):
    """Packed (depth <= 10) merge-join: codes fit the lo lane, so the sort key
    is one uint32 with the data/query flag folded into its LSB.

    Both sorts carry a single aux lane — a slot needs EITHER its qid (query,
    for the return-to-query-order sort) OR its payload (data, riding the
    scan), never both, so aux = qid for queries and (1<<30)|payload for data
    (qid < 2^30 since group rows cap at ~2^20 elements; payload < N < 2^30).
    That makes each sort a 2-operand 2-key instance (the uniformly-fast
    compile zone, see ops/pallas_sort.py:use_pallas_sort) and cuts sort data
    movement by a third vs the previous 3-operand form. The second sort's key
    IS aux: queries come back in qid order, data slots (aux >= 2^30) sort
    after every query."""
    b, n = data_hi.shape
    m = qhi.shape[-1]
    assert m < (1 << 30) and n < (1 << 30)
    sentinel = SENTINEL_PACKED  # even (data flag) and above any code<<1
    # codes are <= 30 bits but lane-split at bit 24 (see lexsort_pair):
    # repack (hi << 24) | lo so coords >= 256 join correctly; only padding
    # (SENTINEL_HI) exceeds 0x3F in the hi lane
    dkey = jnp.where(
        data_hi > jnp.uint32(0x3F), sentinel,
        ((data_hi << 24) | data_lo) << 1,
    )
    qkey = (((qhi << 24) | qlo) << 1) | jnp.uint32(1)
    key = jnp.concatenate([dkey, qkey], axis=-1)
    data_bit = jnp.uint32(1) << 30
    aux = jnp.concatenate(
        [
            data_payload.astype(jnp.uint32) | data_bit,
            jax.lax.broadcasted_iota(jnp.uint32, (b, m), 1),
        ],
        axis=-1,
    )
    skey, saux = sort_rows((key, aux), num_keys=1)
    is_data = (skey & jnp.uint32(1)) == 0
    code = skey >> 1

    def combine(a, bb):
        ac, apay, ad = a
        bc, bpay, bd = bb
        return (
            jnp.where(bd, bc, ac),
            jnp.where(bd, bpay, apay),
            ad | bd,
        )

    lcode, lpay, has_data = jax.lax.associative_scan(
        combine,
        (
            jnp.where(is_data, code, 0),
            jnp.where(is_data, saux & (data_bit - 1), 0),
            is_data,
        ),
        axis=-1,
    )
    found_sorted = has_data & (lcode == code) & ~is_data & (skey != sentinel)

    val = lpay | (found_sorted.astype(jnp.uint32) << 31)
    _, val_q = sort_rows((saux, val), num_keys=1)
    pay = (val_q[:, :m] & (data_bit - 1)).astype(jnp.int32)
    found = (val_q[:, :m] >> 31) > 0
    return pay.reshape(qshape), found.reshape(qshape)


def searchsorted_pair_batched(
    data_hi: jnp.ndarray,
    data_lo: jnp.ndarray,
    query_hi: jnp.ndarray,
    query_lo: jnp.ndarray,
) -> jnp.ndarray:
    """Batched lower bound: data [B, N] (each row sorted), queries [B, ...].

    Flattens the batch into the gather indices instead of vmapping — vmapped
    1-D gathers lower to a slow batched-gather on TPU (~1000x slower), while a
    flat take stays on the fast path.
    """
    b, n = data_hi.shape
    qshape = query_hi.shape
    m = int(np.prod(qshape[1:])) if qshape[1:] else 1
    qhi = query_hi.reshape(b, m)
    qlo = query_lo.reshape(b, m)
    flat_hi = data_hi.reshape(-1)
    flat_lo = data_lo.reshape(-1)
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]

    n_iter = max(1, n.bit_length())
    left = jnp.zeros((b, m), jnp.int32)
    right = jnp.full((b, m), n, jnp.int32)

    def body(_, carry):
        left, right = carry
        active = left < right
        mid = (left + right) // 2
        mid_c = jnp.clip(mid, 0, n - 1)
        mhi = jnp.take(flat_hi, base + mid_c, axis=0)
        mlo = jnp.take(flat_lo, base + mid_c, axis=0)
        less = pair_less(mhi, mlo, qhi, qlo)
        left = jnp.where(active & less, mid + 1, left)
        right = jnp.where(active & ~less, mid, right)
        return left, right

    left, right = jax.lax.fori_loop(0, n_iter + 1, body, (left, right))
    return left.reshape(qshape)
