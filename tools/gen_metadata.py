"""One-time converter: reference benchmark metadata -> packaged assets.

Reads the class tables, split lists, and SigLIP2 text embeddings the
reference ships under pointcept/datasets/preprocessing/*/meta_data/ and
emits them in converted form (json / txt / npy) under
scenesplat_tpu/data/metadata/, which is checked in so 200-class eval and
benchmark submission run without hand-supplied files. The tables are public
benchmark constants (ScanNet/ScanNet++/Matterport3D label ids); the tsv is
ScanNet's own label-mapping asset and must stay byte-identical for on-disk
parity.

Run from the repo root with the reference checkout available:
    python tools/gen_metadata.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import ast
import json
import shutil
from pathlib import Path

import numpy as np


def load_constants_module(path: Path) -> dict:
    """Extract top-level tuple/list/dict assignments from a constants .py
    without importing it (it has no imports, but stay side-effect free)."""
    tree = ast.parse(path.read_text())
    out = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            name = getattr(node.targets[0], "id", None)
            if name:
                try:
                    out[name] = ast.literal_eval(node.value)
                except (ValueError, SyntaxError):
                    pass
    return out


def torch_pt_to_npy(src: Path, dst: Path) -> None:
    import torch

    t = torch.load(src, map_location="cpu", weights_only=False)
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    np.save(dst, arr.astype(np.float32))
    print(f"  {dst.name}: {arr.shape} {arr.dtype} -> float32")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument(
        "--out", default="scenesplat_tpu/data/metadata")
    args = ap.parse_args()
    ref = Path(args.reference) / "pointcept" / "datasets" / "preprocessing"
    out = Path(args.out)
    (out / "splits").mkdir(parents=True, exist_ok=True)
    (out / "emb").mkdir(exist_ok=True)

    sc_meta = ref / "scannet" / "meta_data"
    consts = load_constants_module(sc_meta / "scannet200_constants.py")
    splits = load_constants_module(sc_meta / "scannet200_splits.py")
    (out / "scannet.json").write_text(json.dumps({
        "class_ids_20": list(consts["VALID_CLASS_IDS_20"]),
        "class_labels_20": list(consts["CLASS_LABELS_20"]),
    }, indent=1))
    (out / "scannet200.json").write_text(json.dumps({
        "class_ids_200": list(consts["VALID_CLASS_IDS_200"]),
        "class_labels_200": list(consts["CLASS_LABELS_200"]),
        "head": list(splits["HEAD_CATS_SCANNET_200"]),
        "common": list(splits["COMMON_CATS_SCANNET_200"]),
        "tail": list(splits["TAIL_CATS_SCANNET_200"]),
    }, indent=1))
    shutil.copy2(sc_meta / "scannetv2-labels.combined.tsv",
                 out / "scannetv2-labels.combined.tsv")
    for split in ("train", "val", "test"):
        shutil.copy2(sc_meta / f"scannetv2_{split}.txt",
                     out / "splits" / f"scannetv2_{split}.txt")

    spp = ref / "scannetpp" / "metadata"
    shutil.copy2(spp / "semantic_classes.txt",
                 out / "scannetpp_semantic_classes.txt")
    shutil.copy2(spp / "instance_classes.txt",
                 out / "scannetpp_instance_classes.txt")
    shutil.copy2(spp / "semantic_benchmark" / "top100.txt",
                 out / "scannetpp_top100.txt")
    shutil.copy2(spp / "semantic_benchmark" / "top100_instance.txt",
                 out / "scannetpp_top100_instance.txt")

    mp = ref / "matterport3d" / "meta_data"
    shutil.copy2(mp / "matterport_labels_21.txt",
                 out / "matterport_labels_21.txt")
    shutil.copy2(mp / "matterport_nyu160_labels.txt",
                 out / "matterport_nyu160_labels.txt")
    shutil.copy2(mp / "category_mapping.tsv",
                 out / "matterport_category_mapping.tsv")
    for split in ("train", "val", "test"):
        shutil.copy2(mp / f"scenes_{split}.txt",
                     out / "splits" / f"matterport_{split}.txt")

    shutil.copy2(ref / "holicity" / "metadata" / "semseg_labels.txt",
                 out / "holicity_labels.txt")

    emb = {
        "scannet20_siglip2.npy":
            sc_meta / "scannet20_text_embeddings_siglip2.pt",
        "scannet200_siglip2.npy":
            sc_meta / "scannet200_text_embeddings_siglip2.pt",
        "scannetpp_top100_siglip2.npy":
            spp / "semantic_benchmark" / "top100_text_embeddings_siglip2.pt",
        "matterport21_siglip2.npy":
            mp / "matterport21_text_embeddings_siglip2.pt",
        "matterport_nyu160_siglip2.npy":
            mp / "matterport-nyu160_text_embeddings_siglip2.pt",
        "holicity_siglip2.npy":
            ref / "holicity" / "metadata"
            / "holicity_text_embeddings_siglip2.pt",
    }
    for name, src in emb.items():
        torch_pt_to_npy(src, out / "emb" / name)
    print("done")


if __name__ == "__main__":
    main()
