"""Torch->JAX checkpoint bridge: synthetic torch state dict fills the flax
tree with correctly transposed/reshaped values."""

import numpy as np
import pytest
import jax

from scenesplat_tpu.models import PointBatch, build_model
from scenesplat_tpu.utils.ckpt_bridge import convert_ptv3_lang_checkpoint
from test_model import make_point_batch, tiny_backbone_cfg


def synth_torch_state(params, prefix="backbone."):
    """Fabricate a torch-layout state dict covering the flax tree."""
    import re

    rng = np.random.default_rng(0)
    state = {}
    bb = params["backbone_module"]

    def dense(tkey, leaf):
        k = np.asarray(leaf["kernel"])
        state[prefix + tkey + ".weight"] = rng.normal(size=k.T.shape).astype(np.float32)
        if "bias" in leaf:
            state[prefix + tkey + ".bias"] = rng.normal(
                size=np.asarray(leaf["bias"]).shape
            ).astype(np.float32)

    def ln(tkey, leaf):
        state[prefix + tkey + ".weight"] = rng.normal(
            size=np.asarray(leaf["scale"]).shape
        ).astype(np.float32)
        state[prefix + tkey + ".bias"] = rng.normal(
            size=np.asarray(leaf["bias"]).shape
        ).astype(np.float32)

    def bn(tkey, leaf):
        ln(tkey, leaf)
        n = np.asarray(leaf["scale"]).shape
        state[prefix + tkey + ".running_mean"] = rng.normal(size=n).astype(np.float32)
        state[prefix + tkey + ".running_var"] = rng.uniform(0.5, 2, n).astype(np.float32)

    def conv(tkey, leaf, layout):
        k3, cin, cout = np.asarray(leaf["kernel"]).shape
        k = round(k3 ** (1 / 3))
        if layout == "kio":
            w = rng.normal(size=(k, k, k, cin, cout)).astype(np.float32)
        else:  # out-first spconv layout
            w = rng.normal(size=(cout, k, k, k, cin)).astype(np.float32)
        state[prefix + tkey + ".weight"] = w
        if "bias" in leaf:
            state[prefix + tkey + ".bias"] = rng.normal(size=(cout,)).astype(np.float32)

    conv("embedding.stem.conv", bb["embedding"]["conv"], "kio")
    bn("embedding.stem.norm", bb["embedding"]["norm"])
    for name, sub in bb.items():
        m = re.fullmatch(r"(enc|dec)(\d+)_block(\d+)", name)
        if m:
            side, s, i = m.groups()
            t = f"{side}.{side}{s}.block{i}"
            conv(f"{t}.cpe.0", sub["cpe_conv"], "oik")
            dense(f"{t}.cpe.1", sub["cpe_linear"])
            ln(f"{t}.cpe.2", sub["cpe_norm"])
            ln(f"{t}.norm1.0", sub["norm1"])
            ln(f"{t}.norm2.0", sub["norm2"])
            dense(f"{t}.attn.qkv", sub["attn"]["qkv"])
            dense(f"{t}.attn.proj", sub["attn"]["proj"])
            dense(f"{t}.mlp.0.fc1", sub["mlp"]["fc1"])
            dense(f"{t}.mlp.0.fc2", sub["mlp"]["fc2"])
        m = re.fullmatch(r"enc(\d+)_down", name)
        if m:
            dense(f"enc.enc{m.group(1)}.down.proj", sub["proj"])
            bn(f"enc.enc{m.group(1)}.down.norm.0", sub["norm"])
        m = re.fullmatch(r"dec(\d+)_up", name)
        if m:
            s = m.group(1)
            dense(f"dec.dec{s}.up.proj.0", sub["proj"])
            bn(f"dec.dec{s}.up.proj.1", sub["proj_norm"])
            dense(f"dec.dec{s}.up.proj_skip.0", sub["proj_skip"])
            bn(f"dec.dec{s}.up.proj_skip.1", sub["proj_skip_norm"])
    return state


def test_bridge_fills_everything(rng):
    model = build_model(dict(type="LangPretrainer", backbone=tiny_backbone_cfg()))
    point = make_point_batch(np.random.default_rng(1))
    variables = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            p,
            train=False,
        )
    )(point)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    bstats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    torch_state = synth_torch_state(params)
    new_params, new_stats, report = convert_ptv3_lang_checkpoint(
        torch_state, params, bstats
    )
    assert report["unused_torch_keys"] == []

    # every param leaf except drop_path (no params) must have changed
    flat_old = jax.tree_util.tree_leaves_with_path(params)
    flat_new = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(new_params)
    )
    unchanged = [
        jax.tree_util.keystr(p)
        for p, old in flat_old
        if np.array_equal(old, flat_new[jax.tree_util.keystr(p)])
    ]
    assert unchanged == [], unchanged[:8]

    # value-level checks: dense transpose and conv re-layout
    qkv_t = torch_state["backbone.enc.enc0.block0.attn.qkv.weight"]
    got = flat_new["['backbone_module']['enc0_block0']['attn']['qkv']['kernel']"]
    np.testing.assert_array_equal(got, qkv_t.T)
    stem_t = torch_state["backbone.embedding.stem.conv.weight"]  # [k,k,k,in,out]
    got = flat_new["['backbone_module']['embedding']['conv']['kernel']"]
    np.testing.assert_array_equal(got, stem_t.reshape(-1, *stem_t.shape[3:]))
    cpe_t = torch_state["backbone.enc.enc0.block0.cpe.0.weight"]  # [out,k,k,k,in]
    got = flat_new["['backbone_module']['enc0_block0']['cpe_conv']['kernel']"]
    expected = np.moveaxis(cpe_t, 0, -1).reshape(-1, cpe_t.shape[-1], cpe_t.shape[0])
    np.testing.assert_array_equal(got, expected)
    # batch stats mapped
    rm = torch_state["backbone.embedding.stem.norm.running_mean"]
    got = None
    node = new_stats["backbone_module"]["embedding"]["norm"]
    np.testing.assert_array_equal(node["mean"], rm)
