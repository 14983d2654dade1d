"""Per-epoch evaluation hooks.

``LangPretrainZeroShotSemSegEval`` mirrors the reference hook
(pointcept/engines/hooks/evaluator.py:628-1074): after every training epoch it
extracts per-Gaussian features for each validation scene, predicts classes by
cosine similarity against SigLIP2 text embeddings, votes predictions onto the
evaluation point cloud, and drives checkpoint selection with fg_mIoU
(reference l.928). The Multi variant iterates a list of validation datasets.

``SemSegEvaluator`` evaluates logits-based segmentation (reference l.105-246).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from scenesplat_tpu.data import build_dataset
from scenesplat_tpu.data.transforms import seed_transforms
from scenesplat_tpu.engines.eval import (
    ZeroShotMetric,
    evaluate_scene,
    load_class_names,
    load_text_embeddings,
)
from scenesplat_tpu.engines.infer import FeatureExtractor
from scenesplat_tpu.parallel.dist_eval import (
    allreduce_sum_arrays,
    partition_indices,
)
from .default import HOOKS, HookBase


def _as_list(x):
    if x is None:
        return []
    if isinstance(x, (list, tuple)) and x and isinstance(x[0], (list, tuple, str)):
        return list(x)
    return [x]


@HOOKS.register_module()
class LangPretrainZeroShotSemSegEvalMulti(HookBase):
    def __init__(
        self,
        class_names: Sequence,
        text_embeddings: Sequence,
        excluded_classes: Sequence = (),
        pred_label_mapping: Optional[Sequence] = None,
        ignore_index: int = -1,
        vote_k: int = 25,
        enable_voting: bool = True,
        confidence_threshold: float = 0.1,
        eval_interval: int = 1,
        max_scenes: Optional[int] = None,
    ):
        self.class_names_cfg = _as_list(class_names)
        self.text_embeddings_cfg = _as_list(text_embeddings)
        self.excluded_cfg = list(excluded_classes) if excluded_classes else []
        if self.excluded_cfg and not isinstance(self.excluded_cfg[0], (list, tuple)):
            self.excluded_cfg = [self.excluded_cfg] * len(self.class_names_cfg)
        self.pred_label_mapping = pred_label_mapping
        self.ignore_index = ignore_index
        self.vote_k = vote_k
        self.enable_voting = enable_voting
        self.confidence_threshold = confidence_threshold
        self.eval_interval = eval_interval
        self.max_scenes = max_scenes

    def before_train(self):
        cfg = self.trainer.cfg
        val_cfg = cfg.data.get("val")
        if val_cfg is None:
            self.datasets = []
            return
        val_cfgs = val_cfg if isinstance(val_cfg, (list, tuple)) else [val_cfg]
        self.datasets = [build_dataset(dict(c)) for c in val_cfgs]
        self.class_names = [load_class_names(c) for c in self.class_names_cfg]
        self.text_embs = [load_text_embeddings(p) for p in self.text_embeddings_cfg]
        backbone_cfg = cfg.model.get("backbone", cfg.model)
        self.extractor = FeatureExtractor(
            self.trainer.model,
            patch_size=max(backbone_cfg.get("enc_patch_size", [1024])),
        )

    def after_epoch(self):
        if not getattr(self, "datasets", None):
            return
        if (self.trainer.epoch + 1) % self.eval_interval != 0:
            return
        variables = {
            "params": self.trainer.state.params,
            "batch_stats": self.trainer.state.batch_stats,
        }
        fg_mious = []
        for di, dataset in enumerate(self.datasets):
            metric = ZeroShotMetric(
                self.class_names[di], self.excluded_cfg[di] if self.excluded_cfg else (),
                self.ignore_index,
            )
            n_scenes = len(dataset)
            if self.max_scenes:
                n_scenes = min(n_scenes, self.max_scenes)
            # per-process scene shard + confusion-matrix allreduce
            # (reference evaluator.py:845-851) — every host ends with the
            # same metrics, so checkpoint selection stays consistent
            for i in partition_indices(n_scenes):
                seed_transforms((self._seed(), di, i))
                sample = dataset[i]
                feat = self.extractor(variables, sample)
                evaluate_scene(
                    feat=feat,
                    coord=np.asarray(sample["coord"]),
                    segment=np.asarray(sample.get("segment")),
                    text_emb=self.text_embs[di],
                    metric=metric,
                    valid_feat_mask=np.asarray(sample["valid_feat_mask"])
                    if "valid_feat_mask" in sample
                    else None,
                    pc_coord=np.asarray(sample["pc_coord"])
                    if "pc_coord" in sample
                    else None,
                    pc_segment=np.asarray(sample["pc_segment"])
                    if "pc_segment" in sample
                    else None,
                    vote_k=self.vote_k,
                    enable_voting=self.enable_voting,
                    confidence_threshold=self.confidence_threshold,
                    ignore_index=self.ignore_index,
                )
            metric.intersection, metric.union, metric.target = (
                allreduce_sum_arrays(
                    (metric.intersection, metric.union, metric.target)
                )
            )
            res = metric.results()
            fg_mious.append(res["fg_mIoU"])
            self.trainer.logger.info(
                f"val[{di}] mIoU {res['mIoU']:.4f} fg_mIoU {res['fg_mIoU']:.4f} "
                f"mAcc {res['mAcc']:.4f} allAcc {res['allAcc']:.4f}"
            )
            self.trainer.storage.put_scalar(f"val{di}/mIoU", res["mIoU"])
            self.trainer.storage.put_scalar(f"val{di}/fg_mIoU", res["fg_mIoU"])
        mean_fg = float(np.mean(fg_mious)) if fg_mious else 0.0
        # fg_mIoU drives checkpoint selection (reference evaluator.py:928)
        self.trainer.comm_info["current_metric_value"] = mean_fg
        self.trainer.comm_info["current_metric_name"] = "fg_mIoU"
        self.trainer.storage.put_scalar("val/fg_mIoU", mean_fg)


@HOOKS.register_module()
class LangPretrainZeroShotSemSegEval(LangPretrainZeroShotSemSegEvalMulti):
    """Single-dataset variant (reference evaluator.py:628)."""


@HOOKS.register_module()
class SemSegEvaluator(HookBase):
    """Supervised seg evaluation over cfg.data.val (reference evaluator.py:105)."""

    def __init__(self, ignore_index: int = -1, max_scenes: Optional[int] = None):
        self.ignore_index = ignore_index
        self.max_scenes = max_scenes

    def before_train(self):
        cfg = self.trainer.cfg
        val_cfg = cfg.data.get("val")
        self.dataset = build_dataset(dict(val_cfg)) if val_cfg else None
        if self.dataset is not None:
            backbone_cfg = cfg.model.get("backbone", cfg.model)
            self.extractor = FeatureExtractor(
                self.trainer.model,
                patch_size=max(backbone_cfg.get("enc_patch_size", [1024])),
            )
            self.num_classes = cfg.data.get("num_classes")

    def after_epoch(self):
        if self.dataset is None:
            return
        from scenesplat_tpu.utils.misc import intersection_and_union

        variables = {
            "params": self.trainer.state.params,
            "batch_stats": self.trainer.state.batch_stats,
        }
        inter = union = target = 0
        n_scenes = len(self.dataset)
        if self.max_scenes:
            n_scenes = min(n_scenes, self.max_scenes)
        for i in partition_indices(n_scenes):
            seed_transforms((self._seed(), i))
            sample = self.dataset[i]
            logits = self.extractor(variables, sample)
            pred = logits.argmax(-1).astype(np.int32)
            i_, u_, t_ = intersection_and_union(
                pred, np.asarray(sample["segment"]), logits.shape[-1],
                self.ignore_index,
            )
            inter = inter + i_
            union = union + u_
            target = target + t_
        if np.ndim(inter) == 0:  # this rank drew zero scenes
            nc = self.num_classes or 1
            inter = np.zeros(nc)
            union = np.zeros(nc)
            target = np.zeros(nc)
        inter, union, target = allreduce_sum_arrays((inter, union, target))
        iou = inter / np.maximum(union, 1e-10)
        seen = target > 0
        miou = float(iou[seen].mean()) if seen.any() else 0.0
        self.trainer.logger.info(f"val mIoU {miou:.4f}")
        self.trainer.comm_info["current_metric_value"] = miou
        self.trainer.comm_info["current_metric_name"] = "mIoU"
        self.trainer.storage.put_scalar("val/mIoU", miou)


@HOOKS.register_module()
class ClsEvaluator(HookBase):
    """Classification evaluation over cfg.data.val (reference
    evaluator.py:20-102): per-class IoU/accuracy from argmax predictions;
    checkpoint metric = allAcc."""

    def __init__(self, max_scenes: Optional[int] = None, batch_points: int = 0):
        self.max_scenes = max_scenes
        self.batch_points = batch_points

    def before_train(self):
        cfg = self.trainer.cfg
        val_cfg = cfg.data.get("val")
        self.dataset = build_dataset(dict(val_cfg)) if val_cfg else None
        self.num_classes = cfg.data.get("num_classes")
        self.names = cfg.data.get(
            "names", [str(i) for i in range(self.num_classes or 0)]
        )
        if self.dataset is not None:
            import jax

            model = self.trainer.model

            def fwd(variables, coord, feat, grid_coord, mask):
                from scenesplat_tpu.models.structure import PointBatch

                point = PointBatch(
                    coord=coord, feat=feat, grid_coord=grid_coord, mask=mask
                )
                return model.apply(variables, point, train=False)

            self._fwd = jax.jit(fwd)

    def after_epoch(self):
        if self.dataset is None:
            return
        variables = {
            "params": self.trainer.state.params,
            "batch_stats": self.trainer.state.batch_stats,
        }
        n_scenes = len(self.dataset)
        if self.max_scenes:
            n_scenes = min(n_scenes, self.max_scenes)
        inter = np.zeros(self.num_classes)
        union = np.zeros(self.num_classes)
        target = np.zeros(self.num_classes)
        n_pts = self.batch_points or self.trainer.cfg.data.get("num_points", 1024)
        # Round padding targets up to a patch-size multiple (window attention
        # asserts n % patch_size == 0) and to a bucket ladder so oversized
        # scenes don't compile one program per distinct size.
        from scenesplat_tpu.engines.infer import bucket_size, default_buckets

        bb_cfg = self.trainer.cfg.model.get("backbone", {})
        patch = int(np.lcm.reduce(
            [int(p) for p in bb_cfg.get("enc_patch_size", (1,))]
            + [int(p) for p in bb_cfg.get("dec_patch_size", (1,))]
        ))
        ladder = default_buckets(patch, lo=max(512, patch))
        for i in partition_indices(n_scenes):
            seed_transforms((self._seed(), i))
            sample = self.dataset[i]
            coord = np.asarray(sample["coord"], np.float32)
            feat = np.asarray(sample["feat"], np.float32)
            gc = np.asarray(sample["grid_coord"], np.int32)
            n = coord.shape[0]
            tgt = max(n_pts, n)
            if n > n_pts or tgt % patch:
                tgt = bucket_size(tgt, patch, ladder)
            pad = tgt - n
            mask = np.zeros(tgt, bool)
            mask[:n] = True

            def p(x):
                return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))[None]

            logits = np.asarray(
                self._fwd(variables, p(coord), p(feat), p(gc), mask[None])
            )[0]
            pred = int(logits.argmax(-1))
            label = int(np.asarray(sample["category"]).reshape(-1)[0])
            if 0 <= label < self.num_classes:
                target[label] += 1
                union[label] += 1
                if pred == label:
                    inter[label] += 1
                elif 0 <= pred < self.num_classes:
                    union[pred] += 1
        inter, union, target = allreduce_sum_arrays((inter, union, target))
        iou = inter / np.maximum(union, 1e-10)
        acc = inter / np.maximum(target, 1e-10)
        seen = target > 0
        m_iou = float(iou[seen].mean()) if seen.any() else 0.0
        m_acc = float(acc[seen].mean()) if seen.any() else 0.0
        all_acc = float(inter.sum() / max(target.sum(), 1e-10))
        self.trainer.logger.info(
            f"Val result: mIoU/mAcc/allAcc {m_iou:.4f}/{m_acc:.4f}/{all_acc:.4f}"
        )
        self.trainer.comm_info["current_metric_value"] = all_acc
        self.trainer.comm_info["current_metric_name"] = "allAcc"
        self.trainer.storage.put_scalar("val/allAcc", all_acc)
        self.trainer.storage.put_scalar("val/mAcc", m_acc)


@HOOKS.register_module()
class InsSegEvaluator(HookBase):
    """Instance-segmentation evaluation with the ScanNet AP protocol
    (reference evaluator.py:249-625); PointGroup proposals are generated
    host-side from the jitted (logits, bias) forward. Checkpoint metric =
    AP50."""

    def __init__(
        self,
        segment_ignore_index=(-1,),
        instance_ignore_index: int = -1,
        max_scenes: Optional[int] = None,
    ):
        self.segment_ignore_index = tuple(segment_ignore_index)
        self.instance_ignore_index = instance_ignore_index
        self.max_scenes = max_scenes

    def before_train(self):
        import jax.numpy as jnp

        cfg = self.trainer.cfg
        val_cfg = cfg.data.get("val")
        self.dataset = build_dataset(dict(val_cfg)) if val_cfg else None
        self.num_classes = cfg.data.get("num_classes")
        self.names = cfg.data.get(
            "names", [str(i) for i in range(self.num_classes or 0)]
        )
        self.model_cfg = dict(cfg.model)
        if self.dataset is not None:
            self.extractor = FeatureExtractor(
                self.trainer.model,
                patch_size=1024,
                output_fn=lambda out: jnp.concatenate(
                    [out[0].feat, out[1].astype(out[0].feat.dtype)], axis=-1
                ),
            )

    def after_epoch(self):
        if self.dataset is None:
            return
        from scenesplat_tpu.models.point_group import proposals_from_predictions
        from scenesplat_tpu.utils.insseg_eval import (
            associate_instances,
            evaluate_matches,
        )

        variables = {
            "params": self.trainer.state.params,
            "batch_stats": self.trainer.state.batch_stats,
        }
        mc = self.model_cfg
        scenes = []
        n_scenes = len(self.dataset)
        if self.max_scenes:
            n_scenes = min(n_scenes, self.max_scenes)
        for i in partition_indices(n_scenes):
            seed_transforms((self._seed(), i))
            sample = self.dataset[i]
            out = self.extractor(variables, sample)
            logits, bias = out[:, : -3], out[:, -3:]
            pred = proposals_from_predictions(
                np.asarray(sample["coord"], np.float32), logits, bias,
                segment_ignore_index=mc.get(
                    "segment_ignore_index", self.segment_ignore_index
                ),
                cluster_thresh=mc.get("cluster_thresh", 1.5),
                cluster_propose_points=mc.get("cluster_propose_points", 100),
                cluster_min_points=mc.get("cluster_min_points", 50),
                voxel_size=mc.get("voxel_size", 0.02),
            )
            scenes.append(associate_instances(
                pred["pred_masks"], pred["pred_classes"], pred["pred_scores"],
                np.asarray(sample["segment"]).reshape(-1),
                np.asarray(sample["instance"]).reshape(-1),
                self.num_classes,
                segment_ignore_index=self.segment_ignore_index,
                instance_ignore_index=self.instance_ignore_index,
            ))
        # AP ranks proposal scores globally — gather every rank's per-scene
        # association records before matching (reference comm.gather)
        from scenesplat_tpu.parallel.dist_eval import allgather_pyobjects

        scenes = allgather_pyobjects(scenes)
        scores = evaluate_matches(
            scenes, self.num_classes, self.names,
            segment_ignore_index=self.segment_ignore_index,
        )
        self.trainer.logger.info(
            "Val result: mAP/AP50/AP25 {:.4f}/{:.4f}/{:.4f}".format(
                scores["all_ap"], scores["all_ap_50%"], scores["all_ap_25%"]
            )
        )
        self.trainer.comm_info["current_metric_value"] = scores["all_ap_50%"]
        self.trainer.comm_info["current_metric_name"] = "AP50"
        self.trainer.storage.put_scalar("val/mAP", scores["all_ap"])
        self.trainer.storage.put_scalar("val/AP50", scores["all_ap_50%"])
