"""Bucketed eval-time feature extraction.

Pads each eval scene to the smallest configured bucket and runs a per-bucket
jitted forward; scenes above the largest bucket are split into independent
chunks, mirroring the reference's chunked eval forward
(pointcept/models/default.py:115-176, chunk_size=600000 in
engines/hooks/evaluator.py:762).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np

from scenesplat_tpu.models.structure import PointBatch


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def default_buckets(patch_size: int, lo: Optional[int] = None,
                    hi: int = 524288) -> list:
    """Powers of two plus midpoints (1k, 1.5k, 2k, 3k, ...), each rounded up
    to a ``patch_size`` multiple. Bounds eval compiles at O(log N) programs
    (instead of one per distinct scene size) at a worst-case 33% padding
    overhead. The ladder starts at max(1024, patch_size) so small
    scenes/fragments aren't padded to a distant floor."""
    out = set()
    n = max(1024, patch_size) if lo is None else lo
    while n <= hi:
        for v in (n, n * 3 // 2):
            out.add(_round_up(max(v, patch_size), patch_size))
        n *= 2
    return sorted(out)


def bucket_size(n: int, patch_size: int,
                buckets: Optional[Sequence[int]] = None) -> int:
    """Smallest bucket >= n; above the largest bucket, round up to a
    ``patch_size`` multiple."""
    for b in buckets if buckets is not None else default_buckets(patch_size):
        if n <= b:
            return b
    return max(patch_size, _round_up(n, patch_size))


class FeatureExtractor:
    def __init__(
        self,
        model,
        patch_size: int = 1024,
        buckets: Optional[Sequence[int]] = None,
        chunk_size: int = 524288,
        output_fn=None,
        split_threshold: int = 65536,
    ):
        """``output_fn`` maps the model output to one [B, N, C] array
        (default: PointBatch.feat). Models with auxiliary outputs (e.g.
        PointGroup's bias head) concatenate them here.

        Buckets of ``split_threshold`` points or more build geometry through
        the staged per-step programs (models/ptv3.py:
        build_ptv3_geometry_staged) and feed it into the network program:
        the fused compile exceeds the remote compile helper's memory cap at
        64k+ (CLAUDE.md round-1 notes). Requires a head whose __call__
        accepts ``geometry`` and a PTv3-family backbone; other models run
        fused at every size."""
        self.model = model
        self.patch_size = patch_size
        self.buckets = sorted(buckets) if buckets else None
        self.chunk_size = chunk_size
        self.output_fn = output_fn or (lambda out: out.feat)
        self.split_threshold = split_threshold
        self._jitted = {}
        self._geom_backbone = None
        bb_cfg = getattr(model, "backbone", None)
        if bb_cfg is not None:
            import inspect

            from scenesplat_tpu.models.builder import build_model

            try:
                accepts_geometry = "geometry" in inspect.signature(
                    type(model).__call__
                ).parameters
                bb = build_model(dict(bb_cfg)) if accepts_geometry else None
            except (TypeError, ValueError, KeyError):
                bb = None
            if bb is not None and hasattr(bb, "build_geometry_staged"):
                self._geom_backbone = bb

    def _bucket(self, n: int) -> int:
        if self.buckets:
            for b in self.buckets:
                if n <= b:
                    return b
            return self.buckets[-1]
        # default: O(log N) bucket ladder, not one compile per scene size
        # (each tunnel compile costs seconds-to-minutes; a 300-scene val set
        # would otherwise compile ~300 programs)
        return bucket_size(n, self.patch_size)

    def _split(self, bucket: int) -> bool:
        return (
            self._geom_backbone is not None and bucket >= self.split_threshold
        )

    def _fn(self, bucket: int, has_cls: bool = False):
        key = (bucket, has_cls)
        if key not in self._jitted:
            if self._split(bucket):

                def fwd(variables, coord, feat, grid_coord, mask, geometry):
                    point = PointBatch(
                        coord=coord, feat=feat, grid_coord=grid_coord,
                        mask=mask,
                    )
                    out = self.model.apply(
                        variables, point, train=False, geometry=geometry
                    )
                    return self.output_fn(out)

            elif has_cls:

                def fwd(variables, coord, feat, grid_coord, mask, cls_token):
                    point = PointBatch(
                        coord=coord, feat=feat, grid_coord=grid_coord,
                        mask=mask, cls_token=cls_token,
                    )
                    out = self.model.apply(variables, point, train=False)
                    return self.output_fn(out)

            else:

                def fwd(variables, coord, feat, grid_coord, mask):
                    point = PointBatch(
                        coord=coord, feat=feat, grid_coord=grid_coord,
                        mask=mask,
                    )
                    out = self.model.apply(variables, point, train=False)
                    return self.output_fn(out)

            self._jitted[key] = jax.jit(fwd)
        return self._jitted[key]

    def _run_chunk(self, variables, coord, feat, grid_coord,
                   cls_token=None) -> np.ndarray:
        n = coord.shape[0]
        bucket = self._bucket(n)
        pad = bucket - n
        mask = np.zeros(bucket, bool)
        mask[:n] = True

        def padded(x):
            return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

        args = (
            padded(coord)[None],
            padded(feat)[None],
            padded(grid_coord)[None],
            mask[None],
        )
        if self._split(bucket):
            import jax.numpy as jnp

            from scenesplat_tpu import native
            from scenesplat_tpu.models.ptv3 import stem_plan_from_batch

            c, f, gc, m = (jnp.asarray(a) for a in args)
            # stem k=5 plan on the HOST (native subm_dense_plan == the
            # device builder; extent = the serialization-depth coordinate
            # bound when no static dense_extent is configured) — the k=5
            # build is the dominant device-geometry cost at test-fragment
            # sizes and is a pure function of grid_coord
            bb = self._geom_backbone
            ext = tuple(bb.dense_extent) if bb.dense_extent else (
                (1 << bb.serialization_depth),) * 3
            nbr, val = native.subm_dense_plan(args[2][0], mask, 5, ext)
            stem_plan = stem_plan_from_batch(
                {"stem_nbr": nbr[None], "stem_valid": val[None]}
            )
            geometry = bb.build_geometry_staged(
                PointBatch(coord=c, feat=f, grid_coord=gc, mask=m),
                stem_plan=stem_plan,
            )
            out = self._fn(bucket)(variables, c, f, gc, m, geometry)
        elif cls_token is not None:
            out = self._fn(bucket, has_cls=True)(
                variables, *args,
                np.asarray(cls_token, np.int32).reshape(1),
            )
        else:
            out = self._fn(bucket)(variables, *args)
        return np.asarray(out[0, :n])

    def __call__(self, variables, sample: Dict[str, np.ndarray]) -> np.ndarray:
        """sample: dict with coord [n,3], feat [n,C], grid_coord [n,3]."""
        coord = np.asarray(sample["coord"], np.float32)
        feat = np.asarray(sample["feat"], np.float32)
        grid_coord = np.asarray(sample["grid_coord"], np.int32)
        cls_token = sample.get("cls_token")
        n = coord.shape[0]
        if n <= self.chunk_size:
            return self._run_chunk(variables, coord, feat, grid_coord,
                                   cls_token=cls_token)
        outs = []
        for start in range(0, n, self.chunk_size):
            sl = slice(start, min(start + self.chunk_size, n))
            gc = grid_coord[sl]
            gc = gc - gc.min(axis=0)  # chunks re-quantize independently
            outs.append(self._run_chunk(variables, coord[sl], feat[sl], gc,
                                        cls_token=cls_token))
        return np.concatenate(outs, axis=0)
