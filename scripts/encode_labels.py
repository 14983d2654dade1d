"""Encode class-label text with SigLIP2 into per-class embeddings.

Counterpart of reference scripts/encode_labels.py:1-60: prompts are
"this is a {label}", embeddings L2-normalized, saved as .npy (this framework's
eval loaders accept both .npy and torch .pt).

Requires the SigLIP2 weights (downloads via transformers when network access
is available):
    python scripts/encode_labels.py --labels labels.txt --output emb.npy
"""

from __future__ import annotations

import argparse


def encode_labels(labels, model_name="siglip2-base-patch16-512", add_prefix=True,
                  device="cpu"):
    import torch
    from transformers import AutoModel, AutoTokenizer

    model = AutoModel.from_pretrained(f"google/{model_name}").eval().to(device)
    tokenizer = AutoTokenizer.from_pretrained(f"google/{model_name}")
    prompts = [f"this is a {label}" for label in labels] if add_prefix else labels
    kwargs = dict(padding="max_length", return_tensors="pt")
    if model_name != "siglip-base-patch16-512":
        kwargs["max_length"] = 64
    inputs = {k: v.to(device) for k, v in tokenizer(prompts, **kwargs).items()}
    with torch.no_grad():
        emb = model.get_text_features(**inputs)
        emb = emb / emb.norm(dim=-1, keepdim=True)
    return emb.cpu().numpy()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--labels", required=True, help="text file, one label/line")
    parser.add_argument("--output", required=True, help=".npy output path")
    parser.add_argument("--model", default="siglip2-base-patch16-512")
    parser.add_argument("--no-prefix", action="store_true")
    args = parser.parse_args()
    with open(args.labels) as f:
        labels = [ln.strip() for ln in f if ln.strip()]
    emb = encode_labels(labels, args.model, add_prefix=not args.no_prefix)
    import numpy as np

    np.save(args.output, emb)
    print(f"{len(labels)} labels -> {args.output} {emb.shape}")


if __name__ == "__main__":
    main()
