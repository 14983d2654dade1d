"""Testers: full-benchmark inference over fragmented test datasets.

``ZeroShotSemSegTester`` (reference: pointcept/engines/test.py:116-666):
per scene, accumulate sigmoid class probabilities over complementary voxel
fragments into a full-scene buffer, threshold, inverse-map to the original
points, kNN-vote onto the evaluation point cloud, and report mIoU / fg_mIoU.

``SemSegTester`` (reference test.py:669-955) does the same with supervised
logits.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from scenesplat_tpu.data import build_dataset
from scenesplat_tpu.data.transforms import seed_transforms
from scenesplat_tpu.engines.eval import (
    ZeroShotMetric,
    load_class_names,
    load_text_embeddings,
)
from scenesplat_tpu.engines.infer import FeatureExtractor
from scenesplat_tpu.parallel.dist_eval import (
    allgather_pyobjects,
    allreduce_sum_arrays,
    partition_indices,
)
from scenesplat_tpu.utils.logger import get_root_logger
from scenesplat_tpu.utils.misc import clustering_voting, neighbor_voting
from scenesplat_tpu.utils.registry import Registry

TESTERS = Registry("testers")


class TesterBase:
    def __init__(self, model, variables, dataset_cfg, patch_size=1024,
                 verbose=False, seed=0, weights_fingerprint=None):
        self.model = model
        self.variables = variables
        self.dataset = build_dataset(dict(dataset_cfg))
        self.extractor = FeatureExtractor(model, patch_size=patch_size)
        self.logger = get_root_logger()
        self.verbose = verbose
        self.seed = int(seed)  # transform-RNG seed for scene fetches
        # identifies the weights that produced any cached *_pred.npy at
        # save_path; a mismatch invalidates the resume cache
        self.weights_fingerprint = weights_fingerprint

    def _pred_cache_usable(self, save_path) -> bool:
        """True if cached predictions at ``save_path`` may be reused.

        Cached *_pred.npy files carry no provenance of their own, so a
        sidecar records the weights fingerprint; rerunning with different
        weights at the same save_path invalidates (and re-stamps) the cache
        instead of silently reporting stale predictions."""
        if not save_path:
            return False
        os.makedirs(save_path, exist_ok=True)
        sidecar = os.path.join(save_path, "pred_cache_weights.txt")
        fp = getattr(self, "weights_fingerprint", None)
        if not fp:
            self.logger.warning(
                "no weights fingerprint available: cached *_pred.npy at "
                f"{save_path} (if any) will be reused unverified"
            )
            return True
        prior = None
        if os.path.isfile(sidecar):
            with open(sidecar) as f:
                prior = f.read().strip()
        if prior is not None and prior != fp:
            # DELETE the stale cache before re-stamping the sidecar: if the
            # sidecar were updated with the old files still on disk, a crash
            # mid-eval would leave them behind a now-matching fingerprint and
            # a later resume would silently report the old weights' preds
            import glob

            stale = glob.glob(os.path.join(save_path, "*_pred.npy"))
            for p in stale:
                os.remove(p)
            self.logger.warning(
                f"{save_path} held {len(stale)} predictions from different "
                f"weights ({prior} != {fp}); deleted"
            )
            with open(sidecar, "w") as f:
                f.write(fp + "\n")
            return False
        with open(sidecar, "w") as f:
            f.write(fp + "\n")
        return True


@TESTERS.register_module()
class ZeroShotSemSegTester(TesterBase):
    def __init__(
        self,
        class_names,
        text_embeddings,
        excluded_classes=(),
        enable_voting: bool = True,
        vote_k: int = 25,
        confidence_threshold: float = 0.1,
        ignore_index: int = -1,
        pred_label_mapping: Optional[dict] = None,
        top3: Optional[bool] = None,
        save_feat: bool = False,
        skip_eval: bool = False,
        save_path: Optional[str] = None,
        save_submission: bool = False,
        max_scenes: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.class_names = load_class_names(class_names)
        self.text_emb = load_text_embeddings(text_embeddings)
        assert self.text_emb.shape[0] == len(self.class_names)
        self.excluded_classes = excluded_classes
        self.enable_voting = enable_voting
        self.vote_k = vote_k
        self.confidence_threshold = confidence_threshold
        self.ignore_index = ignore_index
        self.pred_label_mapping = pred_label_mapping
        if top3 is None:
            # the reference keys the protocol on the dataset type, not a
            # config knob ('ScanNetPP' in cfg.data.test.type, test.py:372)
            top3 = "ScanNetPP" in type(self.dataset).__name__
        self.top3 = bool(top3)
        self.save_feat = save_feat
        self.skip_eval = skip_eval
        self.save_path = save_path
        self.save_submission = save_submission
        self.max_scenes = max_scenes

    def test(self):
        metric = ZeroShotMetric(
            self.class_names, self.excluded_classes, self.ignore_index
        )
        record = {}  # per-scene (intersection, union, target), rank-local
        n_scenes = len(self.dataset)
        if self.max_scenes:
            n_scenes = min(n_scenes, self.max_scenes)
        cache_usable = self._pred_cache_usable(self.save_path)
        cache_hits = 0
        # multi-host: each process evaluates its round-robin scene shard;
        # accumulators are allreduced before reporting (reference
        # test.py:549-666 record gather)
        for i in partition_indices(n_scenes):
            seed_transforms((self.seed, i))
            scene = self.dataset[i]
            name = scene.get("name", f"scene{i}")
            segment = np.asarray(scene["segment"]).reshape(-1)
            n = segment.shape[0]
            # resume support: a saved post-voting prediction skips inference
            # (reference test.py:272-288; same caveats — feature saving and
            # pc_coord-based eval need the features, so recompute then)
            pred_save_path = (
                os.path.join(self.save_path, f"{name}_pred.npy")
                if self.save_path else None
            )
            if (
                pred_save_path
                and cache_usable
                and os.path.isfile(pred_save_path)
                and not self.save_feat
                and "pc_coord" not in scene
            ):
                self.logger.info(f"{name}: loaded existing pred")
                cache_hits += 1
                pred_eval = np.load(pred_save_path)
                if pred_eval.ndim > 1:
                    pred_eval = pred_eval[:, 0]  # saved top-3 (reference l.288)
                target = (
                    np.asarray(scene["origin_segment"]).reshape(-1)
                    if "origin_segment" in scene else segment
                )
                if not self.skip_eval and target is not None:
                    before = (metric.intersection.copy(),
                              metric.union.copy(), metric.target.copy())
                    metric.update(pred_eval, target)
                    record[name] = dict(
                        intersection=metric.intersection - before[0],
                        union=metric.union - before[1],
                        target=metric.target - before[2],
                    )
                continue
            prob = np.zeros((n, len(self.class_names)), np.float32)
            feat_sum = (
                np.zeros((n, self.text_emb.shape[1]), np.float32)
                if self.save_feat
                else None
            )
            hits = np.zeros(n, np.int32)
            for frag in scene["fragment_list"]:
                feat = self.extractor(self.variables, frag)
                logits = feat @ self.text_emb.T
                p = 1.0 / (1.0 + np.exp(-logits))
                idx = np.asarray(frag["index"]).reshape(-1)
                prob[idx] += p
                hits[idx] += 1
                if feat_sum is not None:
                    feat_sum[idx] += feat
            if self.save_feat and self.save_path:
                os.makedirs(self.save_path, exist_ok=True)
                norm = np.maximum(hits[:, None], 1)
                np.save(
                    os.path.join(self.save_path, f"{name}_feat.npy"),
                    feat_sum / norm,
                )
            if self.top3:
                # ScanNet++ protocol (reference test.py:373-374): [N, 3]
                # top-class indices, best first, no confidence threshold
                # (the reference thresholds only on the non-top3 branch).
                k3 = min(3, prob.shape[1])
                pred = np.argsort(
                    -prob, axis=1, kind="stable"
                )[:, :k3].astype(np.int32)
            else:
                pred = prob.argmax(axis=1).astype(np.int32)
                conf = prob.max(axis=1) / np.maximum(hits, 1)
                pred[conf < self.confidence_threshold] = self.ignore_index

            # inverse-map to original resolution when available
            valid = np.ones(n, bool)
            coord = np.asarray(scene["coord"])
            if "origin_segment" in scene and "inverse" in scene:
                inverse = np.asarray(scene["inverse"]).reshape(-1)
                pred = pred[inverse]
                segment = np.asarray(scene["origin_segment"]).reshape(-1)
                coord = np.asarray(scene["origin_coord"])
                if "origin_feat_mask" in scene:
                    valid = np.asarray(scene["origin_feat_mask"]).astype(bool)
                else:
                    valid = np.ones(len(pred), bool)

            if self.pred_label_mapping:
                for src_label, dst in self.pred_label_mapping.items():
                    pred[pred == int(src_label)] = int(dst)

            if self.save_submission and self.save_path:
                _write_submission(
                    self.save_path, name, pred, type(self.dataset).__name__,
                    getattr(self.dataset, "class2id", None),
                )

            if self.top3 and pred.ndim > 1:
                # top-1 column for voting and metrics (reference test.py:401,
                # 838: "pred = pred[:, 0]  # for mIoU")
                pred = np.ascontiguousarray(pred[:, 0])

            if self.enable_voting and "pc_coord" in scene:
                vmask = valid & (pred != self.ignore_index)
                pred_eval = neighbor_voting(
                    coord, pred, self.vote_k, vmask, len(self.class_names),
                    query_coord=np.asarray(scene["pc_coord"]),
                    ignore_index=self.ignore_index,
                )
                target = np.asarray(scene["pc_segment"]).reshape(-1)
            else:
                pred_eval, target = pred, segment
            if "origin_instance" in scene:
                pred_eval = clustering_voting(
                    pred_eval, np.asarray(scene["origin_instance"]), self.ignore_index
                )
            if pred_save_path:
                os.makedirs(self.save_path, exist_ok=True)
                np.save(pred_save_path, pred_eval)  # reference test.py:505
            if not self.skip_eval and target is not None:
                before = (metric.intersection.copy(), metric.union.copy(),
                          metric.target.copy())
                metric.update(pred_eval, target)
                i_, u_, t_ = (
                    metric.intersection - before[0],
                    metric.union - before[1],
                    metric.target - before[2],
                )
                record[name] = dict(intersection=i_, union=u_, target=t_)
                # running per-scene log (reference test.py:535-546)
                scene_iou = (i_ / (u_ + 1e-10))[u_ != 0]
                run_iou = (
                    metric.intersection / (metric.union + 1e-10)
                )[metric.union != 0]
                self.logger.info(
                    f"Test: {name} [{i + 1}/{n_scenes}]-{len(target)} "
                    f"Accuracy {i_.sum() / (t_.sum() + 1e-10):.4f} "
                    f"mIoU {scene_iou.mean() if scene_iou.size else 0.0:.4f} "
                    f"({run_iou.mean() if run_iou.size else 0.0:.4f})"
                )
        if cache_hits:
            self.logger.warning(
                f"{cache_hits} scene(s) reported from cached predictions at "
                f"{self.save_path} (delete *_pred.npy to force recompute)"
            )
        # merge per-scene records from every rank (reference test.py:549-560
        # comm.gather) and recompute the totals from the merged record
        all_records = allgather_pyobjects(list(record.items()))
        if not self.skip_eval and all_records:
            merged = dict(all_records)
            metric.intersection = np.sum(
                [v["intersection"] for v in merged.values()], axis=0
            ).astype(np.float64)
            metric.union = np.sum(
                [v["union"] for v in merged.values()], axis=0
            ).astype(np.float64)
            metric.target = np.sum(
                [v["target"] for v in merged.values()], axis=0
            ).astype(np.float64)
        results = metric.results(protocol="tester") if not self.skip_eval else {}
        if results:
            self._log_final_metrics(results)
        return results

    def _log_final_metrics(self, results):
        """Final metric report + eval_results.txt (reference
        test.py:566-666)."""
        self.logger.info(
            "Val result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}".format(
                results["mIoU"], results["mAcc"], results["allAcc"]
            )
        )
        excluded = [
            i for i, nm in enumerate(self.class_names)
            if nm in set(self.excluded_classes)
        ]
        if excluded:
            self.logger.info(
                "Foreground Val result (excluding {} classes): "
                "mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}".format(
                    len(excluded), results["fg_mIoU"], results["fg_mAcc"],
                    results["fg_allAcc"],
                )
            )
        iou = results["iou_per_class"]
        acc = results["acc_per_class"]
        for ci, cname in enumerate(self.class_names):
            self.logger.info(
                f"Class_{ci}-{cname} Result: iou/accuracy "
                f"{iou[ci]:.4f}/{acc[ci]:.4f}"
            )
        if not self.save_path:
            return
        os.makedirs(self.save_path, exist_ok=True)
        with open(os.path.join(self.save_path, "eval_results.txt"), "w") as f:
            f.write(
                "Val result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}\n".format(
                    results["mIoU"], results["mAcc"], results["allAcc"]
                )
            )
            if excluded:
                f.write(
                    "Foreground Val result (excluding {} classes): "
                    "mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}\n".format(
                        len(excluded), results["fg_mIoU"],
                        results["fg_mAcc"], results["fg_allAcc"],
                    )
                )
            f.write("\nPer-class results:\n")
            for ci, cname in enumerate(self.class_names):
                f.write(
                    "Class_{}-{} Result: iou/accuracy {:.4f}/{:.4f}\n".format(
                        ci, cname, iou[ci], acc[ci]
                    )
                )
            if excluded:
                f.write("\nExcluded classes:\n")
                for idx in excluded:
                    f.write(f"Class_{idx}-{self.class_names[idx]}\n")


@TESTERS.register_module()
class ClsTester(TesterBase):
    """Scene/object classification tester (reference test.py:958-1037)."""

    def __init__(self, num_classes: int, max_scenes: Optional[int] = None, **kwargs):
        super().__init__(**kwargs)
        self.num_classes = num_classes
        self.max_scenes = max_scenes

    def test(self):
        correct = total = 0
        n = len(self.dataset)
        if self.max_scenes:
            n = min(n, self.max_scenes)
        for i in partition_indices(n):
            seed_transforms((self.seed, i))
            sample = self.dataset[i]
            logits = self.extractor(self.variables, sample)
            # extractor returns per-point output; classifier heads pool, but
            # for Point outputs average the per-point logits
            if logits.ndim == 2 and logits.shape[0] > 1:
                logits = logits.mean(axis=0)
            pred = int(np.argmax(logits))
            target = int(np.asarray(sample["category"]).reshape(-1)[0])
            correct += int(pred == target)
            total += 1
        correct, total = (
            int(v) for v in allreduce_sum_arrays((correct, total))
        )
        acc = correct / max(total, 1)
        self.logger.info(f"cls accuracy: {acc:.4f} ({correct}/{total})")
        return {"allAcc": acc}


@TESTERS.register_module()
class SemSegTester(TesterBase):
    """Supervised fragment-voting tester (reference test.py:669-955):
    accumulates fragment logits, optional ScanNet++ top-3 protocol
    (reference l.798), benchmark submission writing (l.820-850), per-scene
    running log, and per-rank scene sharding with record merge."""

    def __init__(self, num_classes: int, ignore_index: int = -1,
                 max_scenes: Optional[int] = None,
                 top3: Optional[bool] = None,
                 save_path: Optional[str] = None,
                 save_submission: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.max_scenes = max_scenes
        if top3 is None:
            top3 = "ScanNetPP" in type(self.dataset).__name__
        self.top3 = bool(top3)
        self.save_path = save_path
        self.save_submission = save_submission

    def test(self):
        from scenesplat_tpu.utils.misc import intersection_and_union

        inter = np.zeros(self.num_classes, np.float64)
        union = np.zeros(self.num_classes, np.float64)
        target_area = np.zeros(self.num_classes, np.float64)
        n_scenes = len(self.dataset)
        if self.max_scenes:
            n_scenes = min(n_scenes, self.max_scenes)
        for i in partition_indices(n_scenes):
            seed_transforms((self.seed, i))
            scene = self.dataset[i]
            name = scene.get("name", f"scene{i}")
            segment = np.asarray(scene["segment"]).reshape(-1)
            n = segment.shape[0]
            logits_sum = np.zeros((n, self.num_classes), np.float32)
            for frag in scene["fragment_list"]:
                logits = self.extractor(self.variables, frag)
                idx = np.asarray(frag["index"]).reshape(-1)
                logits_sum[idx] += logits
            if self.top3:
                k3 = min(3, self.num_classes)
                pred = np.argsort(
                    -logits_sum, axis=1, kind="stable"
                )[:, :k3].astype(np.int32)
            else:
                pred = logits_sum.argmax(axis=1).astype(np.int32)
            if "origin_segment" in scene and "inverse" in scene:
                pred = pred[np.asarray(scene["inverse"]).reshape(-1)]
                segment = np.asarray(scene["origin_segment"]).reshape(-1)
            if self.save_submission and self.save_path:
                _write_submission(
                    self.save_path, name, pred, type(self.dataset).__name__,
                    getattr(self.dataset, "class2id", None),
                    getattr(self.dataset, "learning_map_inv", None),
                )
            if self.top3 and pred.ndim > 1:
                pred = np.ascontiguousarray(pred[:, 0])  # reference l.838
            i_, u_, t_ = intersection_and_union(
                pred, segment, self.num_classes, self.ignore_index
            )
            inter = inter + i_
            union = union + u_
            target_area = target_area + t_
            run_iou = (inter / (union + 1e-10))[union != 0]
            self.logger.info(
                f"Test: {name} [{i + 1}/{n_scenes}]-{len(segment)} "
                f"Accuracy {i_.sum() / (t_.sum() + 1e-10):.4f} "
                f"mIoU ({run_iou.mean() if run_iou.size else 0.0:.4f})"
            )
        inter, union, target_area = allreduce_sum_arrays(
            (inter, union, target_area)
        )
        iou = inter / np.maximum(union, 1e-10)
        seen = target_area > 0
        miou = float(iou[seen].mean()) if seen.any() else 0.0
        self.logger.info(f"test mIoU {miou:.4f}")
        return {"mIoU": miou, "iou_per_class": iou}


@TESTERS.register_module()
class ClsVotingTester(TesterBase):
    """Repeated-augmentation voting for classification (reference
    test.py:1040-1154): each repeat re-samples the dataset's stochastic test
    augmentations (or a sample-provided ``voting_list``), softmax
    probabilities accumulate per scene, and the best repeat's record wins."""

    def __init__(self, num_classes: int, num_repeat: int = 100,
                 metric: str = "allAcc", max_scenes: Optional[int] = None,
                 **kwargs):
        super().__init__(**kwargs)
        self.num_classes = num_classes
        self.num_repeat = num_repeat
        self.metric = metric
        self.max_scenes = max_scenes

    def _scene_prob(self, sample):
        def prob_of(s):
            logits = self.extractor(self.variables, s)
            if logits.ndim == 2 and logits.shape[0] > 1:
                logits = logits.mean(axis=0)
            logits = logits - logits.max()
            e = np.exp(logits)
            return e / e.sum()

        if "voting_list" in sample:
            return np.sum([prob_of(s) for s in sample["voting_list"]], axis=0)
        return prob_of(sample)

    def test(self):
        n = len(self.dataset)
        if self.max_scenes:
            n = min(n, self.max_scenes)
        prob_acc = {}
        targets = {}
        best = {self.metric: -1.0}
        shard = partition_indices(n)
        for rep in range(self.num_repeat):
            inter = np.zeros(self.num_classes)
            target = np.zeros(self.num_classes)
            for i in shard:
                seed_transforms((self.seed, rep, i))
                sample = self.dataset[i]
                p = self._scene_prob(sample)
                prob_acc[i] = prob_acc.get(i, 0) + p
                targets[i] = int(np.asarray(sample["category"]).reshape(-1)[0])
                pred = int(np.argmax(prob_acc[i]))
                label = targets[i]
                if 0 <= label < self.num_classes:
                    target[label] += 1
                    if pred == label:
                        inter[label] += 1
            inter, target = allreduce_sum_arrays((inter, target))
            acc_cls = inter / np.maximum(target, 1e-10)
            record = {
                "allAcc": float(inter.sum() / max(target.sum(), 1e-10)),
                "mAcc": float(acc_cls[target > 0].mean()) if (target > 0).any() else 0.0,
            }
            if record[self.metric] > best[self.metric]:
                best = record
            self.logger.info(
                f"vote {rep + 1}/{self.num_repeat}: "
                f"allAcc {record['allAcc']:.4f} mAcc {record['mAcc']:.4f} "
                f"(best {self.metric} {best[self.metric]:.4f})"
            )
        return best


@TESTERS.register_module()
class PartSegTester(TesterBase):
    """Part segmentation tester (reference test.py:1157-1250; its
    ``pred_part.total`` crash at l.1197 is fixed to ``sum``). The dataset
    must expose ``categories`` and ``category2part`` and yield samples with
    ``cls_token``/``segment``; TTA variants come from ``voting_list``."""

    def __init__(self, num_classes: int, max_scenes: Optional[int] = None,
                 **kwargs):
        super().__init__(**kwargs)
        self.num_classes = num_classes
        self.max_scenes = max_scenes

    def test(self):
        ds = self.dataset
        categories = list(ds.categories)
        category2part = dict(ds.category2part)
        iou_category = np.zeros(len(categories))
        iou_count = np.zeros(len(categories))
        n = len(ds)
        if self.max_scenes:
            n = min(n, self.max_scenes)
        for i in partition_indices(n):
            sample = ds[i]
            label = np.asarray(sample["segment"]).reshape(-1)
            variants = sample.get("voting_list", [sample])
            prob = np.zeros((label.shape[0], self.num_classes), np.float32)
            for v in variants:
                logits = self.extractor(self.variables, v)
                logits = logits - logits.max(-1, keepdims=True)
                e = np.exp(logits)
                prob += e / e.sum(-1, keepdims=True)
            pred = prob.argmax(-1)
            cat_idx = int(np.asarray(sample["cls_token"]).reshape(-1)[0])
            parts = category2part[categories[cat_idx]]
            parts_iou = np.zeros(len(parts))
            for j, part in enumerate(parts):
                if (label == part).sum() == 0 and (pred == part).sum() == 0:
                    parts_iou[j] = 1.0
                else:
                    inter = ((label == part) & (pred == part)).sum()
                    union = ((label == part) | (pred == part)).sum()
                    parts_iou[j] = inter / (union + 1e-10)
            iou_category[cat_idx] += parts_iou.mean()
            iou_count[cat_idx] += 1
        iou_category, iou_count = allreduce_sum_arrays(
            (iou_category, iou_count)
        )
        ins_miou = iou_category.sum() / (iou_count.sum() + 1e-10)
        cat_miou = float((iou_category / (iou_count + 1e-10)).mean())
        self.logger.info(
            f"part seg ins.mIoU/cat.mIoU {ins_miou:.4f}/{cat_miou:.4f}"
        )
        return {"ins_mIoU": float(ins_miou), "cat_mIoU": cat_miou}


def _write_submission(save_path, name, pred, dataset_type, class2id=None,
                      learning_map_inv=None):
    """Benchmark submission writers (reference test.py:396-465)."""
    submit_dir = os.path.join(save_path, "submit")
    os.makedirs(submit_dir, exist_ok=True)
    if dataset_type in ("ScanNetGSDataset", "ScanNet200GSDataset") and class2id is not None:
        mapped = np.where(pred >= 0, class2id[np.clip(pred, 0, len(class2id) - 1)], 0)
        np.savetxt(os.path.join(submit_dir, f"{name}.txt"),
                   mapped.reshape(-1, 1), fmt="%d")
    elif dataset_type == "KITTI360GSDataset":
        pred.astype(np.uint32).tofile(os.path.join(submit_dir, f"{name}.label"))
    elif dataset_type == "SemanticKITTIDataset":
        # sequences/<seq>/predictions/<frame>.label with inverse label map
        # (reference test.py:430-455)
        seq, frame = name.split("_")
        d = os.path.join(submit_dir, "sequences", seq, "predictions")
        os.makedirs(d, exist_ok=True)
        out = pred.astype(np.uint32)
        if learning_map_inv is not None:
            out = np.vectorize(learning_map_inv.__getitem__)(out).astype(np.uint32)
        out.tofile(os.path.join(d, f"{frame}.label"))
    elif dataset_type == "NuScenesDataset":
        # lidarseg/test/<name>_lidarseg.bin, classes 1-based uint8
        # (reference test.py:456-465)
        d = os.path.join(submit_dir, "lidarseg", "test")
        os.makedirs(d, exist_ok=True)
        (pred.astype(np.int64) + 1).astype(np.uint8).tofile(
            os.path.join(d, f"{name}_lidarseg.bin")
        )
    else:  # ScanNet++ / Matterport3D / HoliCity: raw int labels
        np.savetxt(os.path.join(submit_dir, f"{name}.txt"),
                   pred.astype(np.int32), delimiter=",", fmt="%d")


def build_tester(cfg, model, variables, dataset_cfg, patch_size=1024,
                 seed=0, weights_fingerprint=None):
    cfg = dict(cfg)
    return TESTERS.build(
        cfg,
        model=model,
        variables=variables,
        dataset_cfg=dataset_cfg,
        patch_size=patch_size,
        seed=seed,
        weights_fingerprint=weights_fingerprint,
    )
