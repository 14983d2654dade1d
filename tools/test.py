"""Testing entry point (reference: tools/test.py): run the configured testers
with a trained checkpoint."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scenesplat_tpu


def main():
    parser = argparse.ArgumentParser("scenesplat_tpu testing")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--options", nargs="*", default=None)
    args = parser.parse_args()
    scenesplat_tpu.apply_platform_env()
    scenesplat_tpu.setup_compilation_cache()

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from scenesplat_tpu.engines.test import build_tester
    from scenesplat_tpu.engines.train_step import point_from_batch
    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.config import Config

    cfg = Config.fromfile(args.config_file)
    cfg.merge_from_options(args.options)

    model_cfg = dict(cfg.model)
    model_cfg.pop("criteria", None)
    model = build_model(model_cfg)

    # init abstract variables, then restore the checkpoint
    import jax.numpy as jnp

    backbone_cfg = model_cfg.get("backbone", model_cfg)
    in_ch = backbone_cfg.get("in_channels", 6)
    patch = max(backbone_cfg.get("enc_patch_size", [1024]))
    n = patch
    point = PointBatch(
        coord=jnp.zeros((1, n, 3)),
        feat=jnp.zeros((1, n, in_ch)),
        grid_coord=jnp.zeros((1, n, 3), jnp.int32),
        mask=jnp.ones((1, n), bool),
    )
    variables = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            p,
            train=False,
        )
    )(point)

    weight = cfg.get("weight")
    if weight and str(weight).endswith((".pth", ".pt")):
        # reference torch checkpoint: shape-validated partial load through
        # the bridge (utils/ckpt_bridge.py), like the reference
        # CheckpointLoader's keyword remap (hooks/misc.py:207-300)
        from scenesplat_tpu.utils.ckpt_bridge import (
            convert_ptv3_lang_checkpoint,
            load_torch_state_dict,
        )

        state = load_torch_state_dict(weight)
        params, bstats, report = convert_ptv3_lang_checkpoint(
            state, variables["params"], variables.get("batch_stats", {})
        )
        print(
            f"bridged torch checkpoint: {report['filled_leaves']} leaves, "
            f"{len(report['unused_torch_keys'])} torch keys unused"
        )
        variables = {"params": params, "batch_stats": bstats}
    elif weight:
        ckptr = ocp.StandardCheckpointer()
        template = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        try:
            payload = ckptr.restore(os.path.abspath(weight), template)
        except Exception:
            # full TrainState checkpoints carry extra keys; retry item-wise
            payload = ckptr.restore(os.path.abspath(weight))
            payload = {
                "params": payload["params"],
                "batch_stats": payload.get("batch_stats", {}),
            }
        variables = {
            "params": payload["params"],
            "batch_stats": payload["batch_stats"],
        }
        print(f"loaded weight: {weight}")

    test_cfgs = cfg.get("test")
    data_cfgs = cfg.data.get("test")
    test_cfgs = test_cfgs if isinstance(test_cfgs, (list, tuple)) else [test_cfgs]
    data_cfgs = data_cfgs if isinstance(data_cfgs, (list, tuple)) else [data_cfgs]
    fingerprint = None
    if weight:
        try:
            st = os.stat(weight)
            fingerprint = f"{os.path.abspath(weight)}:{int(st.st_mtime)}"
        except OSError:
            fingerprint = os.path.abspath(str(weight))
    for tc, dc in zip(test_cfgs, data_cfgs):
        tester = build_tester(tc, model, variables, dc, patch_size=patch,
                              seed=cfg.get("seed", 0),
                              weights_fingerprint=fingerprint)
        tester.test()


if __name__ == "__main__":
    main()
