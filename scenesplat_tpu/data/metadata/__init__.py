"""Packaged benchmark metadata: class tables, split lists, text embeddings.

Converted from the reference's meta_data assets
(pointcept/datasets/preprocessing/{scannet,scannetpp,matterport3d,holicity}/
meta*data/ — see tools/gen_metadata.py) so 200-class eval, zero-shot class
names, and benchmark-submission id mapping run without hand-supplied files.

Config values understand a ``builtin:`` scheme wherever a class-name or
text-embedding path is expected, e.g. ``class_names="builtin:scannet200"``
and ``text_embeddings="builtin:scannet200"`` (engines/eval.py).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, List

import numpy as np

_ROOT = Path(__file__).resolve().parent

#: builtin name -> (labels source, embedding file)
_BUILTIN: Dict[str, tuple] = {
    "scannet20": ("scannet.json:class_labels_20", "scannet20_siglip2.npy"),
    "scannet200": ("scannet200.json:class_labels_200",
                   "scannet200_siglip2.npy"),
    "scannetpp": ("scannetpp_top100.txt", "scannetpp_top100_siglip2.npy"),
    "scannetpp_top100": ("scannetpp_top100.txt",
                         "scannetpp_top100_siglip2.npy"),
    "matterport21": ("matterport_labels_21.txt", "matterport21_siglip2.npy"),
    "matterport160": ("matterport_nyu160_labels.txt",
                      "matterport_nyu160_siglip2.npy"),
    "holicity": ("holicity_labels.txt", "holicity_siglip2.npy"),
}


def builtin_names() -> List[str]:
    return sorted(_BUILTIN)


def _read_label_source(src: str) -> List[str]:
    if ":" in src:
        fname, key = src.split(":")
        return list(json.loads((_ROOT / fname).read_text())[key])
    return [
        ln.strip() for ln in (_ROOT / src).read_text().splitlines()
        if ln.strip()
    ]


@functools.lru_cache(maxsize=None)
def class_labels(name: str) -> List[str]:
    """Class-name list for a builtin table (e.g. 'scannet200')."""
    return _read_label_source(_BUILTIN[name][0])


@functools.lru_cache(maxsize=None)
def text_embeddings(name: str) -> np.ndarray:
    """L2-normalized SigLIP2 text embeddings [num_classes, 768].

    Sliced to the class-label count when the stored table is longer: the
    reference's holicity embedding has 6 rows against a 4-line label file
    (its labels 4='others'/5='sky' are remapped to ignore at preprocessing,
    preprocess_holicity.py:7, yet the embedding keeps all 6) — rows are in
    label order, so the leading rows are the valid classes."""
    emb = np.load(_ROOT / "emb" / _BUILTIN[name][1]).astype(np.float32)
    emb = emb[: len(class_labels(name))]
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    return emb


@functools.lru_cache(maxsize=None)
def _scannet_json(which: str) -> dict:
    return json.loads((_ROOT / which).read_text())


def scannet_class_ids(num_classes: int = 20) -> np.ndarray:
    """Benchmark submission ids (train index -> raw ScanNet id), the
    reference's ``class2id`` (scannet.py:30, scannet200_constants.py)."""
    if num_classes == 20:
        return np.asarray(_scannet_json("scannet.json")["class_ids_20"])
    if num_classes == 200:
        return np.asarray(_scannet_json("scannet200.json")["class_ids_200"])
    raise KeyError(f"no ScanNet benchmark id table for {num_classes} classes")


def scannet200_splits() -> Dict[str, List[str]]:
    """HEAD/COMMON/TAIL category partition (scannet200_splits.py)."""
    d = _scannet_json("scannet200.json")
    return {k: list(d[k]) for k in ("head", "common", "tail")}


@functools.lru_cache(maxsize=None)
def scene_split(dataset: str, split: str) -> List[str]:
    """Scene-name lists, e.g. scene_split('scannetv2', 'val')."""
    p = _ROOT / "splits" / f"{dataset}_{split}.txt"
    return [ln.strip() for ln in p.read_text().splitlines() if ln.strip()]


@functools.lru_cache(maxsize=None)
def scannet_raw_to_nyu40() -> Dict[str, int]:
    """raw_category -> nyu40id from scannetv2-labels.combined.tsv (ScanNet's
    own label-mapping table; used by the raw-scan preprocessor)."""
    out = {}
    lines = (_ROOT / "scannetv2-labels.combined.tsv").read_text().splitlines()
    header = lines[0].split("\t")
    raw_i, nyu_i = header.index("raw_category"), header.index("nyu40id")
    for ln in lines[1:]:
        parts = ln.split("\t")
        if len(parts) > max(raw_i, nyu_i) and parts[nyu_i]:
            out[parts[raw_i]] = int(parts[nyu_i])
    return out


@functools.lru_cache(maxsize=None)
def scannet_raw_to_id200() -> Dict[str, int]:
    """raw_category -> raw ScanNet id (the 'id' column), for ScanNet200
    label encoding."""
    out = {}
    lines = (_ROOT / "scannetv2-labels.combined.tsv").read_text().splitlines()
    header = lines[0].split("\t")
    raw_i, id_i = header.index("raw_category"), header.index("id")
    for ln in lines[1:]:
        parts = ln.split("\t")
        if len(parts) > max(raw_i, id_i) and parts[id_i]:
            out[parts[raw_i]] = int(parts[id_i])
    return out
