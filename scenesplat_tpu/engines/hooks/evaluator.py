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
from scenesplat_tpu.engines.eval import (
    ZeroShotMetric,
    evaluate_scene,
    load_class_names,
    load_text_embeddings,
)
from scenesplat_tpu.engines.infer import FeatureExtractor
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
            for i in range(n_scenes):
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
        for i in range(n_scenes):
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
        iou = inter / np.maximum(union, 1e-10)
        seen = target > 0
        miou = float(iou[seen].mean()) if seen.any() else 0.0
        self.trainer.logger.info(f"val mIoU {miou:.4f}")
        self.trainer.comm_info["current_metric_value"] = miou
        self.trainer.comm_info["current_metric_name"] = "mIoU"
        self.trainer.storage.put_scalar("val/mIoU", miou)
