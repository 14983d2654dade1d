"""Export a trained checkpoint to a reference-loadable torch .pth.

Reverse of the torch->flax bridge used by tools/test.py: takes a config +
an orbax checkpoint trained HERE and writes a state dict the reference
stack (pointcept/models/..., tools/test.py there) loads with
``load_state_dict(strict=True)`` — so users can migrate models in BOTH
directions. Currently supports the flagship PTv3 families (LangPretrainer,
DefaultSegmentorV2 / bare PT-v3m1 backbones).

Usage:
    python tools/export_checkpoint.py --config-file <cfg.py> \
        --weight <save_path>/model/model_best --output model_export.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scenesplat_tpu


def main():
    parser = argparse.ArgumentParser("scenesplat_tpu checkpoint export")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--weight", required=True,
                        help="orbax checkpoint dir (model_best/model_last)")
    parser.add_argument("--output", required=True, help=".pth output path")
    parser.add_argument("--options", nargs="*", default=None)
    args = parser.parse_args()
    scenesplat_tpu.apply_platform_env()
    scenesplat_tpu.setup_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    import torch

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import (
        export_ptv3_lang_checkpoint,
        export_spunet_checkpoint,
    )
    from scenesplat_tpu.utils.config import Config

    cfg = Config.fromfile(args.config_file)
    cfg.merge_from_options(args.options)

    model_cfg = dict(cfg.model)
    model_cfg.pop("criteria", None)
    model_type = model_cfg.get("type")
    model = build_model(model_cfg)

    backbone_cfg = model_cfg.get("backbone", model_cfg)
    in_ch = backbone_cfg.get("in_channels", 6)
    patch = max(backbone_cfg.get("enc_patch_size", [1024]))
    point = PointBatch(
        coord=jnp.zeros((1, patch, 3)),
        feat=jnp.zeros((1, patch, in_ch)),
        grid_coord=jnp.zeros((1, patch, 3), jnp.int32),
        mask=jnp.ones((1, patch), bool),
    )
    variables = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            p, train=False,
        )
    )(point)

    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    try:
        payload = ckptr.restore(os.path.abspath(args.weight), template)
    except BaseException:
        payload = ckptr.restore(os.path.abspath(args.weight))
    params = jax.tree_util.tree_map(np.asarray, payload["params"])
    bstats = jax.tree_util.tree_map(
        np.asarray, payload.get("batch_stats", {}) or {}
    )

    bb_type = backbone_cfg.get("type", model_type)
    if model_type in (None, "PT-v3m1", "SpUNet-v1m1"):
        prefix, bb_key = "", ""
    else:
        prefix, bb_key = "backbone.", "backbone_module"
    if bb_type and bb_type.startswith("SpUNet"):
        bb_params = params.get(bb_key, params) if bb_key else params
        bb_stats = bstats.get(bb_key, bstats) if bb_key else bstats
        state = export_spunet_checkpoint(
            bb_params, bb_stats, backbone_prefix=prefix)
    elif bb_type and bb_type.startswith("PT-v3"):
        state = export_ptv3_lang_checkpoint(
            params, bstats, backbone_prefix=prefix, flax_backbone_key=bb_key)
    else:
        raise SystemExit(
            f"export not implemented for backbone type {bb_type!r} "
            "(supported: PT-v3m1, SpUNet-v1m1)"
        )

    # non-backbone heads: DefaultSegmentorV2's linear seg head
    if "seg_head" in params:
        state["seg_head.weight"] = np.asarray(params["seg_head"]["kernel"]).T
        if "bias" in params["seg_head"]:
            state["seg_head.bias"] = np.asarray(params["seg_head"]["bias"])

    out = {
        "state_dict": {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in state.items()
        },
    }
    torch.save(out, args.output)
    print(f"exported {len(state)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
