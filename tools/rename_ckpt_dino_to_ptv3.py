"""Extract the student or teacher backbone from an SSL checkpoint into a
LangPretrainer-compatible parameter tree (reference:
scripts/rename_ckpt_dino_to_ptv3.py:1-71).

Usage:
    python tools/rename_ckpt_dino_to_ptv3.py --input exp/ssl/model/model_last \
        --output exp/ssl/backbone_for_vl --source teacher
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="SSL orbax checkpoint dir")
    parser.add_argument("--output", required=True)
    parser.add_argument("--source", choices=["student", "teacher"], default="teacher")
    args = parser.parse_args()

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(args.input))
    if args.source == "teacher":
        backbone = payload["teacher_params"]
        stats = payload.get("teacher_batch_stats", {})
    else:
        backbone = payload["params"]["backbone_module"]
        stats = payload.get("batch_stats", {}).get("backbone_module", {})
    out = {
        "params": {"backbone_module": backbone},
        "batch_stats": {"backbone_module": stats},
    }
    ckptr.save(os.path.abspath(args.output), out)
    ckptr.wait_until_finished()
    print(f"{args.source} backbone -> {args.output}")


if __name__ == "__main__":
    main()
