"""Masked Scene Contrast (MSC-v1m1), TPU-native.

Re-design of the reference MSC
(pointcept/models/masked_scene_contrast/masked_scene_contrast_v1m1_base.py:24-320)
for fixed-shape padded two-view batches:

  - cross-mask generation (voxel_grid + randperm over patches, l.71-141) ->
    cluster plan over the concatenated per-scene union of both views'
    original coords; patch tags are drawn i.i.d. with P(tag=1)=P(tag=2)=
    mask_rate instead of an exact-count permutation (same rate in
    expectation; a permutation needs dynamic patch counts).
  - pointops.knn_query pair matching (l.144-172) -> tiled matmul kNN;
    one random in-radius partner per view1 point; a fixed matching_max_pair
    slot buffer selected by random priorities, surplus slots masked.
  - InfoNCE over the [P, P] similarity with masked invalid rows/columns
    (l.174-204); DDP all_reduce of the scalar loss -> the data-mesh pmean
    already averages per-device losses.
  - view mixing (l.247-255) is delegated to collate-time Mix3D (the padded
    layout cannot merge scenes in-model); reconstruction heads operate on
    masked points via weighted means.

Note: the reference normal "loss" (l.296-318) *adds* the raw sum of
prediction-target dot products (no negation) — reproduced verbatim for
parity; flip ``reconstruct_normal_sign`` to get the (presumably intended)
alignment objective.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from scenesplat_tpu.ops import pointops as po
from scenesplat_tpu.ops.segops import unpool_values
from scenesplat_tpu.ops.serialization import take_along_points
from .builder import MODELS, build_model
from .structure import PointBatch


@MODELS.register_module("MSC-v1m1")
class MaskedSceneContrast(nn.Module):
    backbone: dict
    backbone_in_channels: int
    backbone_out_channels: int
    mask_grid_size: float = 0.1
    mask_rate: float = 0.4
    matching_max_k: int = 8
    matching_max_radius: float = 0.03
    matching_max_pair: int = 8192
    nce_t: float = 0.4
    contrast_weight: float = 1.0
    reconstruct_weight: float = 1.0
    reconstruct_color: bool = True
    reconstruct_normal: bool = True
    reconstruct_normal_sign: float = 1.0  # reference uses +1 (l.296-318)
    knn_tile: int = 512

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.mask_token = self.param(
            "mask_token", nn.initializers.truncated_normal(0.02),
            (self.backbone_in_channels,), jnp.float32,
        )
        if self.reconstruct_color:
            self.color_head = nn.Dense(3)
        if self.reconstruct_normal:
            self.normal_head = nn.Dense(3)

    def generate_cross_masks(self, rng, oc1, m1, oc2, m2):
        """Reference l.71-141 in fixed shapes: tag grid patches of the union
        cloud 0/1/2; view1 masks tag==1 points, view2 tag==2."""
        union = jnp.concatenate([oc1, oc2], axis=1)
        umask = jnp.concatenate([m1, m2], axis=1)
        n_union = union.shape[1]
        plan = po.grid_cluster_plan(union, umask, self.mask_grid_size, n_union)
        r = jax.random.uniform(rng, plan.out_mask.shape)
        tag_patch = jnp.where(
            r < self.mask_rate, 1, jnp.where(r < 2 * self.mask_rate, 2, 0)
        ).astype(jnp.int32)
        tag_point = unpool_values(
            tag_patch[..., None], plan.cluster_of_point
        )[..., 0]
        n1 = oc1.shape[1]
        mask1 = (tag_point[:, :n1] == 1) & m1
        mask2 = (tag_point[:, n1:] == 2) & m2
        return mask1, mask2

    def match_contrastive_pair(self, rng, oc1, m1, oc2, m2):
        """Reference l.144-172: one random in-radius view2 partner per view1
        point, subsampled to a fixed matching_max_pair buffer."""
        b, n1 = m1.shape
        idx, dist = po.knn(
            oc2, m2, self.matching_max_k, query=oc1, query_mask=m1,
            tile=self.knn_tile,
        )
        valid = (idx >= 0) & (dist < self.matching_max_radius)
        k_pick, k_rows = jax.random.split(rng)
        prio = jax.random.uniform(k_pick, valid.shape) * valid
        pick = jnp.argmax(prio, axis=-1)
        partner = jnp.take_along_axis(idx, pick[..., None], axis=-1)[..., 0]
        row_valid = valid.any(axis=-1)

        p_cap = min(self.matching_max_pair, b * n1)
        flat_valid = row_valid.reshape(-1)
        score = jnp.where(
            flat_valid, jax.random.uniform(k_rows, (b * n1,)), -1.0
        )
        top, rows = jax.lax.top_k(score, p_cap)
        pair_valid = top >= 0.0
        scene = rows // n1
        i1 = rows % n1
        i2 = jnp.take(partner.reshape(-1), rows)
        return scene, i1, jnp.maximum(i2, 0), pair_valid

    def compute_contrastive_loss(self, f1, f2, scene, i1, i2, pair_valid):
        """Reference l.174-204 with slot-buffer masking."""
        n1, n2 = f1.shape[1], f2.shape[1]
        g1 = jnp.take(f1.reshape((-1,) + f1.shape[2:]), scene * n1 + i1, axis=0)
        g2 = jnp.take(f2.reshape((-1,) + f2.shape[2:]), scene * n2 + i2, axis=0)
        g1 = g1 / (jnp.linalg.norm(g1.astype(jnp.float32), axis=-1, keepdims=True) + 1e-7)
        g2 = g2 / (jnp.linalg.norm(g2.astype(jnp.float32), axis=-1, keepdims=True) + 1e-7)
        sim = g1.astype(jnp.float32) @ g2.astype(jnp.float32).T  # [P, P]
        w = pair_valid.astype(jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)
        pos_sim = (jnp.diagonal(sim) * w).sum() / denom
        # reference l.191: neg = sim.mean(-1).mean() - pos_sim / P (the
        # diagonal's share of the row means is removed)
        neg_sim = (
            ((sim * w[None, :]).sum(-1) * w).sum()
            / jnp.maximum((w[None, :].sum() * w).sum(), 1.0)
            - pos_sim / denom
        )
        logits = sim / self.nce_t + jnp.where(pair_valid, 0.0, -1e9)[None, :]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nce = -(jnp.diagonal(logp) * w).sum() / denom
        return nce, jax.lax.stop_gradient(pos_sim), jax.lax.stop_gradient(neg_sim)

    def _contrastive(self, f1, f2, oc1, oc2, scene, i1, i2, pair_valid):
        """Loss-dispatch hook: v1m1 ignores the coords; MSC-v1m2 (CSC)
        overrides with the partitioned InfoNCE."""
        return self.compute_contrastive_loss(f1, f2, scene, i1, i2, pair_valid)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        oc1, oc2 = batch["view1_origin_coord"], batch["view2_origin_coord"]
        m1, m2 = batch["view1_mask"], batch["view2_mask"]
        f1_in, f2_in = batch["view1_feat"], batch["view2_feat"]

        rng = self.make_rng("shuffle")
        k_mask, k_pair = jax.random.split(rng)
        if "view1_point_mask" in batch:
            # injected masks (deterministic replay / golden tests): bypass
            # the random patch tagging, keep everything downstream live
            pm1 = batch["view1_point_mask"] & m1
            pm2 = batch["view2_point_mask"] & m2
        else:
            pm1, pm2 = self.generate_cross_masks(k_mask, oc1, m1, oc2, m2)

        token = self.mask_token.astype(f1_in.dtype)
        f1_in = jnp.where(pm1[..., None], token, f1_in)
        f2_in = jnp.where(pm2[..., None], token, f2_in)

        def run(coord, feat, gc, mask):
            point = PointBatch(coord=coord, feat=feat, grid_coord=gc, mask=mask)
            return self.backbone_module(point, train=train).feat

        f1 = run(batch["view1_coord"], f1_in, batch["view1_grid_coord"], m1)
        f2 = run(batch["view2_coord"], f2_in, batch["view2_grid_coord"], m2)

        if "match_scene" in batch:
            # injected match pairs (same replay/golden channel as the masks)
            scene, i1, i2, pair_valid = (
                batch["match_scene"], batch["match_i1"], batch["match_i2"],
                batch["match_valid"],
            )
        else:
            scene, i1, i2, pair_valid = self.match_contrastive_pair(
                k_pair, oc1, m1, oc2, m2
            )
        nce, pos_sim, neg_sim = self._contrastive(
            f1, f2, oc1, oc2, scene, i1, i2, pair_valid
        )
        loss = nce * self.contrast_weight
        out = {"nce_loss": nce, "pos_sim": pos_sim, "neg_sim": neg_sim}

        if self.reconstruct_color:
            c1 = self.color_head(f1)
            c2 = self.color_head(f2)
            w1 = pm1.astype(jnp.float32)[..., None]
            w2 = pm2.astype(jnp.float32)[..., None]
            num = (((c1 - batch["view1_color"]) ** 2) * w1).sum() + (
                ((c2 - batch["view2_color"]) ** 2) * w2
            ).sum()
            color_loss = num / jnp.maximum(w1.sum() + w2.sum(), 1.0)
            loss = loss + color_loss * self.reconstruct_weight
            out["color_loss"] = color_loss

        if self.reconstruct_normal:
            def ndot(feats, normals, pm):
                p = self.normal_head(feats)
                p = p / (jnp.linalg.norm(p.astype(jnp.float32), axis=-1,
                                         keepdims=True) + 1e-10)
                w = pm.astype(jnp.float32)
                return ((p * normals).sum(-1) * w).sum(), w.sum()

            s1, c1n = ndot(f1, batch["view1_normal"], pm1)
            s2, c2n = ndot(f2, batch["view2_normal"], pm2)
            normal_loss = self.reconstruct_normal_sign * (s1 + s2) / jnp.maximum(
                c1n + c2n, 1.0
            )
            loss = loss + normal_loss * self.reconstruct_weight
            out["normal_loss"] = normal_loss

        out["loss"] = loss
        return out


@MODELS.register_module("MSC-v1m2")
class MaskedSceneContrastCSC(MaskedSceneContrast):
    """MSC v1m2: contrastive backend with CSC spatial partitions
    (reference masked_scene_contrast_v1m2_csc.py:24-384).

    The reference partitions matched pairs by relative displacement —
    partition_matrix[i, j] = f(c1[j] - c2[i]) (v1m2 l.182-201): ids 0-3 for
    (r1 < d <= r2 | d > r2) x (dz > 0 | dz < 0); every other cell —
    including the whole diagonal (d ~ 0 <= r1) and dz == 0 cells — keeps the
    -1e7 init, which torch's ``part.unique()`` surfaces as a 5th
    always-present partition while the loss still divides by
    ``partitions`` = 4. Per-scene InfoNCE runs once per partition id with
    the diagonal force-included; absent partitions contribute exactly 0
    (diag-only softmax), so this fixed-shape version evaluates all five ids
    unconditionally. The pos/neg monitors replicate the reference's
    running-accumulator formula verbatim (neg uses pos accumulated over all
    scenes SO FAR, v1m2 l.236-238). The loss consumes ORIGIN coords
    (v1m2 l.330-336)."""

    partitions: int = 4
    r1: float = 0.125
    r2: float = 2.0

    def _contrastive(self, f1, f2, oc1, oc2, scene, i1, i2, pair_valid):
        n1, n2 = f1.shape[1], f2.shape[1]
        b_scenes = f1.shape[0]

        def gather(x, n, idx):
            return jnp.take(x.reshape((-1,) + x.shape[2:]),
                            scene * n + idx, axis=0)

        g1 = gather(f1, n1, i1).astype(jnp.float32)
        g2 = gather(f2, n2, i2).astype(jnp.float32)
        g1 = g1 / (jnp.linalg.norm(g1, axis=-1, keepdims=True) + 1e-7)
        g2 = g2 / (jnp.linalg.norm(g2, axis=-1, keepdims=True) + 1e-7)
        sim = g1 @ g2.T  # [P, P]
        c1 = gather(oc1, n1, i1).astype(jnp.float32)
        c2 = gather(oc2, n2, i2).astype(jnp.float32)

        rel = c1[None, :, :] - c2[:, None, :]  # [i, j] = c1[j] - c2[i]
        dist = jnp.sqrt((rel**2).sum(-1) + 1e-7)
        up = rel[..., 2] > 0.0
        down = rel[..., 2] < 0.0
        mid = (dist > self.r1) & (dist <= self.r2)
        far = dist > self.r2
        sent = -1  # the -1e7 "close/degenerate" partition
        part = jnp.where(
            mid & up, 0, jnp.where(
                mid & down, 1, jnp.where(
                    far & up, 2, jnp.where(far & down, 3, sent))))
        p = sim.shape[0]
        eye = jnp.eye(p, dtype=bool)

        loss = jnp.asarray(0.0, jnp.float32)
        pos = jnp.asarray(0.0, jnp.float32)
        neg = jnp.asarray(0.0, jnp.float32)
        for s in range(b_scenes):
            row = pair_valid & (scene == s)
            w = row.astype(jnp.float32)
            cnt = w.sum()
            has = cnt > 0
            denom = jnp.maximum(cnt, 1.0)
            pos_b = (jnp.diagonal(sim) * w).sum() / denom
            pos = pos + jnp.where(has, pos_b, 0.0)
            row_means = (sim * w[None, :]).sum(-1) / denom
            neg_b = (row_means * w).sum() / denom - pos / denom
            neg = neg + jnp.where(has, neg_b, 0.0)
            colpen = jnp.where(row, 0.0, -1e9)[None, :]
            for pid in (sent, 0, 1, 2, 3):
                pm = (part == pid) | eye
                logits = sim / self.nce_t - 1e9 * (~pm).astype(jnp.float32)
                logp = jax.nn.log_softmax(logits + colpen, axis=-1)
                ce = -(jnp.diagonal(logp) * w).sum() / denom
                loss = loss + jnp.where(has, ce, 0.0)
        loss = loss / (b_scenes * self.partitions)
        pos = pos / b_scenes
        neg = neg / b_scenes
        return loss, jax.lax.stop_gradient(pos), jax.lax.stop_gradient(neg)
