"""Shared 3DGS data-pipeline builders for config files.

Config files import this module (it lives next to them; configs run with
``__file__`` set, so a relative ``sys.path`` insert works) and call these
builders instead of duplicating ~150-line transform lists per dataset.
Hyperparameters mirror the reference configs they are cited from
(reference: configs/scannet/lang-pretrain-scannet-mcmc-wo-normal-contrastive.py:125-302,
configs/scannet/semseg-gs-scannet-all-w-normal-fixed-xyz.py:116-280,
configs/scannet/ssl-pretrain-scannet-all-base.py:104-280).

Every builder returns plain lists/dicts of config primitives, so the
resulting merged config still dumps cleanly to .py.
"""

GS_FEAT_KEYS = ("color", "opacity", "quat", "scale")


def _geo_photo_augs(jitter_clip=0.01):
    """The standard train-time geometric+photometric augmentation prefix."""
    return [
        dict(type="CenterShift", apply_z=True),
        dict(type="RandomDropout", dropout_ratio=0.2,
             dropout_application_ratio=0.2),
        dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0],
             p=0.5),
        dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
        dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
        dict(type="RandomScale", scale=[0.9, 1.1]),
        dict(type="RandomFlip", p=0.5),
        dict(type="RandomJitter", sigma=0.005, clip=jitter_clip),
        dict(type="ElasticDistortion",
             distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
        dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
        dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
        dict(type="ChromaticJitter", p=0.95, std=0.05),
    ]


def lang_train_transform(grid_sample_keys, feat_keys=GS_FEAT_KEYS,
                         point_max=192000, grid_size=0.02,
                         host_plan_extent=(1024, 1024, 1024)):
    """VL-pretraining train pipeline (reference config l.125-172).

    ``host_plan_extent``: HostConvPlan builds the stem k=5 conv plan in the
    loader workers (default extent = the serialization_depth=10 coordinate
    bound); None disables it and the trainer builds the plan on device."""
    return _geo_photo_augs() + [
        dict(type="GridSample", grid_size=grid_size, hash_type="fnv",
             mode="train", keys=grid_sample_keys, return_grid_coord=True),
        dict(type="SphereCrop", point_max=point_max, mode="random"),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
        dict(type="ToTensor"),
        dict(type="Collect",
             keys=("coord", "grid_coord", "segment", "lang_feat",
                   "valid_feat_mask"),
             feat_keys=feat_keys),
    ] + (
        [dict(type="HostConvPlan", kernel_size=5, extent=host_plan_extent)]
        if host_plan_extent else []
    )


def lang_val_transform(grid_sample_keys, feat_keys=GS_FEAT_KEYS,
                       grid_size=0.02, collect_extra=("pc_coord",
                                                      "pc_segment")):
    """VL-pretraining val pipeline (reference config l.176-219)."""
    return [
        dict(type="CenterShift", apply_z=True),
        dict(type="GridSample", grid_size=grid_size, hash_type="fnv",
             mode="train", keys=grid_sample_keys, return_grid_coord=True),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
        dict(type="ToTensor"),
        dict(type="Collect",
             keys=("coord", "grid_coord", "segment", "lang_feat",
                   "valid_feat_mask") + tuple(collect_extra),
             feat_keys=feat_keys),
    ]


def lang_test_transform_and_cfg(grid_sample_keys, feat_keys=GS_FEAT_KEYS):
    """Fragment-inference test pipeline: dedup 1 cm GridSample with inverse,
    then mode="test" 2 cm voxelization into complementary fragments
    (reference config l.222-301)."""
    # lang_feat/valid_feat_mask are dropped from the per-fragment path: no
    # tester/extractor consumes them (ours mirrors the reference, whose
    # ZeroShotSemSegTester never reads input_dict["lang_feat"] either — the
    # reference config's Collect of it, l.279-301, is dead weight). The
    # tester's masking uses the full-res origin_feat_mask Copy'd above.
    # Skipping them removes a per-scene [N, 768] f16 sorted gather (~1.3 s
    # at 698k points on a 1-core host) and ~0.25 GB of H2D per fragment.
    _frag_keys = tuple(
        k for k in grid_sample_keys
        if k not in ("segment", "lang_feat", "valid_feat_mask")
    )
    transform = [
        dict(type="CenterShift", apply_z=True),
        dict(type="NormalizeColor"),
        dict(type="Copy",
             keys_dict={"segment": "origin_segment", "coord": "origin_coord",
                        "valid_feat_mask": "origin_feat_mask"}),
        dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="train",
             keys=_frag_keys, return_inverse=True),
    ]
    test_cfg = dict(
        voxelize=dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                      mode="test", keys=_frag_keys, return_grid_coord=True),
        crop=None,
        post_transform=[
            dict(type="CenterShift", apply_z=False),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "index"),
                 feat_keys=feat_keys),
        ],
        aug_transform=[[dict(type="RandomRotateTargetAngle", angle=[0],
                             axis="z", center=[0, 0, 0], p=1)]],
    )
    return transform, test_cfg


def semseg_train_transform(grid_sample_keys, feat_keys, point_max=204800,
                           grid_size=0.02):
    """Supervised semseg train pipeline (reference semseg config l.116-139)."""
    return _geo_photo_augs(jitter_clip=0.02) + [
        dict(type="GridSample", grid_size=grid_size, hash_type="fnv",
             mode="train", keys=grid_sample_keys, return_grid_coord=True),
        dict(type="SphereCrop", point_max=point_max, mode="random"),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
        dict(type="ToTensor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"),
             feat_keys=feat_keys),
    ]


def semseg_val_transform(grid_sample_keys, feat_keys, grid_size=0.02):
    return [
        dict(type="CenterShift", apply_z=True),
        dict(type="GridSample", grid_size=grid_size, hash_type="fnv",
             mode="train", keys=grid_sample_keys, return_grid_coord=True),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
        dict(type="ToTensor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"),
             feat_keys=feat_keys),
    ]


def semseg_tta():
    """The reference's 12-view rotate+rescale+flip TTA set
    (reference semseg config aug_transform, l.212-276)."""
    augs = []
    for scale in (0.95, 1.05):
        for angle in (0, 1 / 2, 1, 3 / 2):
            augs.append([
                dict(type="RandomRotateTargetAngle", angle=[angle], axis="z",
                     center=[0, 0, 0], p=1),
                dict(type="RandomScale", scale=[scale, scale]),
            ])
    augs.append([dict(type="RandomFlip", p=1)])
    return augs


def semseg_test_transform_and_cfg(grid_sample_keys, feat_keys):
    """Fragment-inference semseg test path (reference semseg config
    l.172-277)."""
    transform = [
        dict(type="CenterShift", apply_z=True),
        dict(type="NormalizeColor"),
        dict(type="Copy", keys_dict={"segment": "origin_segment"}),
        dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="train",
             keys=grid_sample_keys, return_inverse=True),
    ]
    test_cfg = dict(
        voxelize=dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                      mode="test",
                      keys=tuple(k for k in grid_sample_keys
                                 if k != "segment"),
                      return_grid_coord=True),
        crop=None,
        post_transform=[
            dict(type="CenterShift", apply_z=False),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "index"),
                 feat_keys=feat_keys),
        ],
        aug_transform=semseg_tta(),
    )
    return transform, test_cfg


def _ssl_crop_transform(blur_p, solarize=False, grid_size=0.02):
    """Per-crop photometric pipeline inside the SSL view generator
    (reference ssl config global_transform0/1 + local_transform,
    l.151-242)."""
    t = [
        dict(type="RandomColorJitter", brightness=0.4, contrast=0.4,
             saturation=0.2, hue=0.1, p=0.8),
        dict(type="RandomColorGrayScale", p=0.2),
        dict(type="GridSample", grid_size=grid_size, hash_type="fnv",
             mode="train",
             keys=("coord", "color", "scale", "quat", "opacity"),
             return_grid_coord=True),
        dict(type="CenterShift", apply_z=False),
        dict(type="GSGaussianBlurVoxelOpc", p=blur_p,
             extra_keys=("scale", "quat", "opacity")),
    ]
    if solarize:
        t.append(dict(type="RandomColorSolarize", p=0.2))
    t += [dict(type="NormalizeColor"), dict(type="ToTensor")]
    return t


def ssl_train_transform(local_crop_num=3, point_max=204800 * 4,
                        crop_point_max=102400 * 3):
    """SimDINO SSL multi-crop pipeline (reference ssl config l.104-280)."""
    view_keys = ("coord", "color", "scale", "quat", "opacity")
    prefixes = tuple(["global_crop0", "global_crop1"]
                     + [f"local_crop{i}" for i in range(local_crop_num)])
    collect = dict(
        type="CollectContrast",
        keys_prefix=prefixes,
        offset_keys_dict={f"{p}_offset": f"{p}_coord" for p in prefixes},
    )
    for p in prefixes:
        collect[f"{p}_feat_keys"] = (
            f"{p}_color", f"{p}_opacity", f"{p}_quat", f"{p}_scale")
    return _geo_photo_augs(jitter_clip=0.02) + [
        dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
             keys=view_keys, return_grid_coord=False),
        dict(type="SphereCrop", point_max=point_max, mode="random"),
        dict(
            type="ContrastiveViewsGenerator_SSL",
            local_crop_num=local_crop_num,
            view_keys=view_keys,
            global_base_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="RandomFlip", p=0.5),
                dict(type="SphereCropRandomMaxPoints",
                     random_scale=(0.4, 1.0), point_max=crop_point_max),
            ],
            local_base_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="RandomFlip", p=0.5),
                dict(type="SphereCropRandomMaxPoints",
                     random_scale=(0.1, 0.4), point_max=crop_point_max),
            ],
            global_transform0=_ssl_crop_transform(blur_p=1.0),
            global_transform1=_ssl_crop_transform(blur_p=0.1, solarize=True),
            local_transform=_ssl_crop_transform(blur_p=0.5),
        ),
        collect,
    ]
