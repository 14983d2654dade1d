"""PointGroup: native clustering, model forward, loss, proposals."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu import native
from scenesplat_tpu.models import PointBatch, build_model
from scenesplat_tpu.models.point_group import (
    pointgroup_loss,
    proposals_from_predictions,
)


def test_pointgroup_cluster_components():
    # two well-separated blobs of label 3, one blob of label 5 overlapping
    # blob A spatially (labels separate them), plus an isolated point
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (40, 3)) + [0, 0, 0]
    b = rng.normal(0, 0.05, (35, 3)) + [5, 0, 0]
    c = rng.normal(0, 0.05, (30, 3)) + [0.1, 0, 0]
    iso = np.array([[20.0, 20.0, 20.0]])
    coord = np.concatenate([a, b, c, iso]).astype(np.float32)
    labels = np.concatenate(
        [np.full(40, 3), np.full(35, 3), np.full(30, 5), [3]]
    ).astype(np.int32)
    cl, num = native.pointgroup_cluster(coord, labels, radius=0.5, min_points=10)
    assert num == 3
    assert len(set(cl[:40].tolist())) == 1 and cl[0] >= 0
    assert len(set(cl[40:75].tolist())) == 1 and cl[40] != cl[0]
    assert len(set(cl[75:105].tolist())) == 1 and cl[75] not in (cl[0], cl[40])
    assert cl[105] == -1  # isolated, below min_points

    # fallback path must agree on component structure
    if native.available():
        import scenesplat_tpu.native as nat

        saved = nat._LIB
        try:
            nat._LIB = False
            cl2, num2 = native.pointgroup_cluster(
                coord, labels, radius=0.5, min_points=10
            )
            assert num2 == num
            # same partition up to relabeling
            for grp in (slice(0, 40), slice(40, 75), slice(75, 105)):
                assert len(set(cl2[grp].tolist())) == 1
            assert cl2[105] == -1
        finally:
            nat._LIB = saved


def _pg_model():
    return build_model(dict(
        type="PG-v1m1",
        backbone=dict(
            type="SpUNet-v1m1", in_channels=6, num_classes=0,
            base_channels=8, channels=(8, 16, 16, 8), layers=(1, 1, 1, 1),
            serialization_depth=10, stage_capacity=(1.0, 1.0),
        ),
        backbone_out_channels=8,
        semantic_num_classes=6,
    ))


def test_pointgroup_forward_and_loss():
    rng = np.random.default_rng(1)
    b, n = 2, 96
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 70:] = False
    point = PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )
    model = _pg_model()
    params = model.init(jax.random.PRNGKey(0), point)
    out, bias = model.apply(params, point)
    assert out.feat.shape == (b, n, 6) and bias.shape == (b, n, 3)

    instance = rng.integers(-1, 4, (b, n)).astype(np.int32)
    centroid = coord + rng.normal(0, 0.1, (b, n, 3)).astype(np.float32)
    segment = rng.integers(0, 6, (b, n)).astype(np.int32)

    def ce(logits, seg, mask=None):
        logp = jax.nn.log_softmax(logits)
        pick = jnp.take_along_axis(logp, seg[..., None], axis=-1)[..., 0]
        w = mask.astype(jnp.float32)
        return -(pick * w).sum() / w.sum()

    total, aux = pointgroup_loss(
        out.feat, bias, point.coord, jnp.asarray(segment),
        jnp.asarray(instance), jnp.asarray(centroid), out.mask, criteria=ce,
    )
    assert bool(jnp.isfinite(total))
    assert set(aux) == {"seg_loss", "bias_l1_loss", "bias_cosine_loss"}
    assert float(total) >= float(aux["seg_loss"])


def test_proposals_from_predictions():
    rng = np.random.default_rng(2)
    # 2 instances of class 2 far apart + background class 0 (ignored)
    n1, n2, nb = 150, 140, 50
    coord = np.concatenate([
        rng.normal(0, 0.005, (n1, 3)) + [0, 0, 0],
        rng.normal(0, 0.005, (n2, 3)) + [3, 0, 0],
        rng.normal(0, 0.005, (nb, 3)) + [1.5, 2, 0],
    ]).astype(np.float32)
    n = coord.shape[0]
    logits = np.full((n, 4), -5.0, np.float32)
    logits[:n1, 2] = 5.0
    logits[n1:n1 + n2, 2] = 5.0
    logits[n1 + n2:, 0] = 5.0
    bias = np.zeros((n, 3), np.float32)
    out = proposals_from_predictions(
        coord, logits, bias, segment_ignore_index=(-1, 0, 1),
        cluster_thresh=1.5, cluster_propose_points=100,
        cluster_min_points=50, voxel_size=0.02,
    )
    assert out["pred_masks"].shape == (2, n)
    assert (out["pred_classes"] == 2).all()
    assert (out["pred_scores"] > 0.9).all()
    sizes = sorted(out["pred_masks"].sum(1).tolist())
    assert sizes == [n2, n1]
