"""PointBatch: the fixed-shape batched point-cloud pytree.

TPU-native replacement for the reference ``Point`` dict
(pointcept/models/utils/structure.py:14-140). The reference packs scenes into
one ragged [sum(N_i), C] buffer addressed by ``offset``; on TPU every scene is
padded to a static N and the batch is an explicit leading axis, so every
downstream op is jit-compatible with static shapes. Padding slots are flagged
by ``mask`` and carry sentinel serialization codes that sort last.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp

from scenesplat_tpu.ops.serialization import (
    Serialization,
    grid_coord_from_coord,
    serialize,
    shuffle_orders as _shuffle_orders,
)


@flax.struct.dataclass
class PointBatch:
    """Batched padded point cloud.

    coord      [B, N, 3] float — raw coordinates
    feat       [B, N, C] float — per-point features
    grid_coord [B, N, 3] int32 — non-negative voxel coordinates
    mask       [B, N]    bool  — True for real points, False for padding
    ser        per-curve serialization state (orders/inverses/codes), or None
    cls_token  [B] int32 per-scene shape category, or None — consumed by the
               category-conditioned PartSeg heads (reference
               point_transformer_partseg.py:330-344 data_dict["cls_token"])
    """

    coord: jnp.ndarray
    feat: jnp.ndarray
    grid_coord: jnp.ndarray
    mask: jnp.ndarray
    ser: Optional[Serialization] = None
    cls_token: Optional[jnp.ndarray] = None

    @property
    def batch_size(self) -> int:
        return self.coord.shape[0]

    @property
    def num_points(self) -> int:
        return self.coord.shape[1]

    def serialized(
        self,
        orders: Sequence[str],
        depth: int = 16,
        shuffle_rng: Optional[jax.Array] = None,
    ) -> "PointBatch":
        """Attach serialization state (reference structure.py:47-102)."""
        ser = serialize(self.grid_coord, self.mask, orders=orders, depth=depth)
        if shuffle_rng is not None and len(orders) > 1:
            ser = _shuffle_orders(ser, shuffle_rng)
        return self.replace(ser=ser)

    @staticmethod
    def from_inputs(
        coord: jnp.ndarray,
        feat: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        grid_coord: Optional[jnp.ndarray] = None,
        grid_size: Optional[float] = None,
    ) -> "PointBatch":
        """Build from raw arrays; quantizes coords when grid_coord is absent
        (reference structure.py:54-62 fallback path)."""
        if mask is None:
            mask = jnp.ones(coord.shape[:2], bool)
        if grid_coord is None:
            assert grid_size is not None, "need grid_coord or grid_size"
            grid_coord = grid_coord_from_coord(coord, grid_size, mask)
        return PointBatch(
            coord=coord, feat=feat, grid_coord=grid_coord, mask=mask
        )
