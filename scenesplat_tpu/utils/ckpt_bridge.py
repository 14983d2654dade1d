"""PyTorch -> JAX checkpoint bridge for reference SceneSplat weights.

Maps the reference LangPretrainer / PT-v3m1 torch state dict
(pointcept/models/default.py:77, point_transformer_v3m1_base.py:518) onto this
framework's flax parameter tree, so released checkpoints (e.g. HF
GaussianWorld/SceneSplat_lang-pretrain-...-contrastive, README.md:178) can be
evaluated here.

Key-layout correspondence (torch -> flax):
  backbone.embedding.stem.conv.weight        -> backbone_module/embedding/conv/kernel
  backbone.embedding.stem.norm.{...}         -> embedding/norm (BN: scale/bias + batch_stats)
  backbone.enc.enc{S}.block{I}.cpe.0.weight  -> enc{S}_block{I}/cpe_conv/kernel
  ...cpe.1.{weight,bias}                     -> cpe_linear (Dense, weight transposed)
  ...cpe.2.{weight,bias}                     -> cpe_norm (LayerNorm)
  ...norm1.0 / norm2.0                       -> norm1 / norm2
  ...attn.qkv / attn.proj                    -> attn/qkv, attn/proj
  ...mlp.0.fc1 / fc2                         -> mlp/fc1, fc2
  backbone.enc.enc{S}.down.proj/norm.0       -> enc{S}_down/proj, norm
  backbone.dec.dec{S}.up.proj.{0,1}          -> dec{S}_up/proj, proj_norm
  backbone.dec.dec{S}.up.proj_skip.{0,1}     -> dec{S}_up/proj_skip, proj_skip_norm

spconv.SubMConv3d kernels are stored either as [k,k,k,in,out] or
[out,k,k,k,in] depending on the spconv algo; both are detected by shape and
re-laid-out to this framework's [k^3, in, out] with kernel offsets enumerated
in itertools.product order (x-major), matching spconv's kernel-position
enumeration.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt.get("model", ckpt))
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv_kernel(w: np.ndarray, in_ch: int, out_ch: int) -> np.ndarray:
    """Normalize a spconv kernel to [k^3, in, out]."""
    if w.ndim == 5:
        if w.shape[-1] == out_ch and w.shape[-2] == in_ch:
            # [k,k,k,in,out]
            k3 = w.shape[0] * w.shape[1] * w.shape[2]
            return w.reshape(k3, in_ch, out_ch)
        if w.shape[0] == out_ch and w.shape[-1] == in_ch:
            # [out,k,k,k,in] -> [k,k,k,in,out]
            w = np.moveaxis(w, 0, -1)
            k3 = w.shape[0] * w.shape[1] * w.shape[2]
            return w.reshape(k3, in_ch, out_ch)
    if w.ndim == 3 and w.shape == (w.shape[0], in_ch, out_ch):
        return w
    raise ValueError(f"unrecognized spconv kernel shape {w.shape}")


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_ptv3_lang_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_prefix: str = "backbone.",
    flax_backbone_key: str = "backbone_module",
):
    """Fill flax params/batch_stats trees from a torch state dict.

    Returns (params, batch_stats, report) where report lists unmatched torch
    keys and unfilled flax leaves (shape-validated partial load like the
    reference CheckpointLoader, hooks/misc.py:207-300).
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, params_template)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats_template)
    params = jax.tree_util.tree_map(lambda x: x.copy(), params)
    batch_stats = jax.tree_util.tree_map(lambda x: x.copy(), batch_stats)
    used = set()
    filled = set()

    bb_params = params.get(flax_backbone_key, params)
    bb_stats = batch_stats.get(flax_backbone_key, batch_stats)

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def put_dense(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        _assign(bb_params, fpath + ("kernel",), w.T, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(bb_params, fpath + ("bias",), b, filled)

    def put_ln(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        _assign(bb_params, fpath + ("scale",), w, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(bb_params, fpath + ("bias",), b, filled)

    def put_bn(tkey, fpath):
        put_ln(tkey, fpath)
        rm = torch_get(tkey + ".running_mean")
        rv = torch_get(tkey + ".running_var")
        if rm is not None:
            _assign(bb_stats, fpath + ("mean",), rm, filled)
        if rv is not None:
            _assign(bb_stats, fpath + ("var",), rv, filled)

    def put_conv(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        tmpl = _lookup(bb_params, fpath + ("kernel",))
        if tmpl is None:
            return
        k3, cin, cout = tmpl.shape
        _assign(bb_params, fpath + ("kernel",), _conv_kernel(w, cin, cout), filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(bb_params, fpath + ("bias",), b, filled)

    # embedding stem
    put_conv("embedding.stem.conv", ("embedding", "conv"))
    put_bn("embedding.stem.norm", ("embedding", "norm"))
    # SSL variant's learnable mask token ([1, C] -> [C])
    mt = torch_get("mask_token")
    if mt is not None:
        _assign(bb_params, ("mask_token",), np.asarray(mt).reshape(-1),
                filled)

    # stages: discover from flax template names (enc{S}_block{I} etc.)
    for name in list(bb_params.keys()):
        m = re.fullmatch(r"(enc|dec)(\d+)_block(\d+)", name)
        if m:
            side, s, i = m.group(1), m.group(2), m.group(3)
            t = f"{side}.{side}{s}.block{i}"
            put_conv(f"{t}.cpe.0", (name, "cpe_conv"))
            put_dense(f"{t}.cpe.1", (name, "cpe_linear"))
            put_ln(f"{t}.cpe.2", (name, "cpe_norm"))
            put_ln(f"{t}.norm1.0", (name, "norm1"))
            put_ln(f"{t}.norm2.0", (name, "norm2"))
            put_dense(f"{t}.attn.qkv", (name, "attn", "qkv"))
            put_dense(f"{t}.attn.proj", (name, "attn", "proj"))
            rpe = torch_get(f"{t}.attn.rpe.rpe_table")
            if rpe is not None:
                _assign(bb_params, (name, "attn", "rpe_table"), rpe, filled)
            put_dense(f"{t}.mlp.0.fc1", (name, "mlp", "fc1"))
            put_dense(f"{t}.mlp.0.fc2", (name, "mlp", "fc2"))
            continue
        m = re.fullmatch(r"enc(\d+)_down", name)
        if m:
            s = m.group(1)
            put_dense(f"enc.enc{s}.down.proj", (name, "proj"))
            put_bn(f"enc.enc{s}.down.norm.0", (name, "norm"))
            continue
        m = re.fullmatch(r"dec(\d+)_up", name)
        if m:
            s = m.group(1)
            put_dense(f"dec.dec{s}.up.proj.0", (name, "proj"))
            put_bn(f"dec.dec{s}.up.proj.1", (name, "proj_norm"))
            put_dense(f"dec.dec{s}.up.proj_skip.0", (name, "proj_skip"))
            put_bn(f"dec.dec{s}.up.proj_skip.1", (name, "proj_skip_norm"))
            continue

    report = {
        "unused_torch_keys": sorted(
            k for k in torch_state if k not in used
        ),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def convert_spunet_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_prefix: str = "backbone.",
):
    """Fill flax SpUNet params/batch_stats from a reference SpUNet state
    dict (spconv_unet_v1m1_base.py:88-280 key layout).

    torch -> flax correspondence:
      conv_input.0.weight              -> conv_input/kernel  [125, in, base]
      conv_input.1.*                   -> norm_input/norm    (BN)
      down.{s}.0.weight                -> down{s}/kernel     [8, in, out]
      down.{s}.1.*                     -> down{s}_norm/norm
      enc.{s}.block{i}.conv1/2.weight  -> enc{s}_block{i}/conv1|2/kernel
      ...bn1/bn2.*                     -> .../bn1|bn2/norm
      ...proj.0.weight / proj.1.*      -> .../proj (Dense) + proj_norm/norm
      up.{s}.0.weight / up.{s}.1.*     -> up{s}/kernel + up{s}_norm/norm
      dec.{s}.block{i}.*               -> dec{s}_block{i}/...
      final.weight/bias ([1,1,1,C,K])  -> final/kernel|bias  (Dense)
    """
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    used = set()
    filled = set()

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def put_bn(tkey, fpath):
        pairs = [
            (".weight", params, fpath + ("norm", "scale")),
            (".bias", params, fpath + ("norm", "bias")),
            (".running_mean", batch_stats, fpath + ("norm", "mean")),
            (".running_var", batch_stats, fpath + ("norm", "var")),
        ]
        for suffix, tree, path in pairs:
            w = torch_get(tkey + suffix)
            if w is not None:
                _assign(tree, path, w, filled)
        torch_get(tkey + ".num_batches_tracked")  # consume

    def put_conv(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        tmpl = _lookup(params, fpath + ("kernel",))
        if tmpl is None:
            return
        k3, cin, cout = tmpl.shape
        _assign(params, fpath + ("kernel",), _conv_kernel(w, cin, cout),
                filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_pointwise(tkey, fpath):
        """1x1 SubMConv == Dense: [1,1,1,in,out] (or [out,1,1,1,in]) ->
        kernel [in, out]."""
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        if w.ndim == 5:
            if w.shape[:3] == (1, 1, 1):
                w = w.reshape(w.shape[3], w.shape[4])
            else:  # [out, 1, 1, 1, in]
                w = w.reshape(w.shape[0], w.shape[4]).T
        _assign(params, fpath + ("kernel",), w, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    put_conv("conv_input.0", ("conv_input",))
    put_bn("conv_input.1", ("norm_input",))
    put_pointwise("final", ("final",))

    for name in list(params.keys()):
        m = re.fullmatch(r"down(\d+)", name)
        if m:
            s = m.group(1)
            put_conv(f"down.{s}.0", (name,))
            put_bn(f"down.{s}.1", (f"down{s}_norm",))
            continue
        m = re.fullmatch(r"up(\d+)", name)
        if m:
            s = m.group(1)
            put_conv(f"up.{s}.0", (name,))
            put_bn(f"up.{s}.1", (f"up{s}_norm",))
            continue
        m = re.fullmatch(r"(enc|dec)(\d+)_block(\d+)", name)
        if m:
            t = f"{m.group(1)}.{m.group(2)}.block{m.group(3)}"
            put_conv(f"{t}.conv1", (name, "conv1"))
            put_conv(f"{t}.conv2", (name, "conv2"))
            put_bn(f"{t}.bn1", (name, "bn1"))
            put_bn(f"{t}.bn2", (name, "bn2"))
            put_pointwise(f"{t}.proj.0", (name, "proj"))
            put_bn(f"{t}.proj.1", (name, "proj_norm"))
            continue

    report = {
        "unused_torch_keys": sorted(k for k in torch_state if k not in used),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def export_spunet_checkpoint(
    params,
    batch_stats,
    backbone_prefix: str = "backbone.",
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_spunet_checkpoint`: reference-loadable torch
    state dict (spconv_unet_v1m1_base.py:88-280 key layout) from flax trees.
    Conv kernels go out in spconv2's [k, k, k, in, out] layout (the layout
    the import goldens pin via tests/ref_exec_stubs.py); 1x1 convs
    (``final``) as [1, 1, 1, in, out]; BatchNorms get int64
    ``num_batches_tracked`` zeros so ``load_state_dict(strict=True)``
    round-trips (tests/test_export_bridge.py).
    """
    out: Dict[str, np.ndarray] = {}

    def get(fpath, stats=False):
        v = _lookup(batch_stats if stats else params, fpath)
        return None if v is None else np.asarray(v)

    def put(tkey, value):
        out[backbone_prefix + tkey] = np.asarray(value)

    def put_bn(tkey, fpath):
        w = get(fpath + ("norm", "scale"))
        if w is None:
            return
        put(tkey + ".weight", w)
        put(tkey + ".bias", get(fpath + ("norm", "bias")))
        put(tkey + ".running_mean", get(fpath + ("norm", "mean"), stats=True))
        put(tkey + ".running_var", get(fpath + ("norm", "var"), stats=True))
        put(tkey + ".num_batches_tracked", np.zeros((), np.int64))

    def put_conv(tkey, fpath):
        w = get(fpath + ("kernel",))
        if w is None:
            return
        k3, cin, cout = w.shape
        k = round(k3 ** (1 / 3))
        assert k * k * k == k3, f"non-cubic conv kernel {w.shape}"
        put(tkey + ".weight", w.reshape(k, k, k, cin, cout))
        b = get(fpath + ("bias",))
        if b is not None:
            put(tkey + ".bias", b)

    def put_pointwise(tkey, fpath):
        w = get(fpath + ("kernel",))
        if w is None:
            return
        put(tkey + ".weight", w.reshape(1, 1, 1, *w.shape))
        b = get(fpath + ("bias",))
        if b is not None:
            put(tkey + ".bias", b)

    put_conv("conv_input.0", ("conv_input",))
    put_bn("conv_input.1", ("norm_input",))
    put_pointwise("final", ("final",))

    for name in sorted(params.keys()):
        m = re.fullmatch(r"down(\d+)", name)
        if m:
            s = m.group(1)
            put_conv(f"down.{s}.0", (name,))
            put_bn(f"down.{s}.1", (f"down{s}_norm",))
            continue
        m = re.fullmatch(r"up(\d+)", name)
        if m:
            s = m.group(1)
            put_conv(f"up.{s}.0", (name,))
            put_bn(f"up.{s}.1", (f"up{s}_norm",))
            continue
        m = re.fullmatch(r"(enc|dec)(\d+)_block(\d+)", name)
        if m:
            t = f"{m.group(1)}.{m.group(2)}.block{m.group(3)}"
            put_conv(f"{t}.conv1", (name, "conv1"))
            put_conv(f"{t}.conv2", (name, "conv2"))
            put_bn(f"{t}.bn1", (name, "bn1"))
            put_bn(f"{t}.bn2", (name, "bn2"))
            put_pointwise(f"{t}.proj.0", (name, "proj"))
            put_bn(f"{t}.proj.1", (name, "proj_norm"))
            continue

    return out


def convert_ptv2_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_prefix: str = "backbone.",
):
    """Fill flax PTv2 params/batch_stats from a reference PT-v2m1/m2 state
    dict (point_transformer_v2m2_base.py:446-579 key layout).

    torch -> flax:
      patch_embed.proj.0 / .1.norm     -> patch_embed_proj / patch_embed_norm
      patch_embed.blocks.blocks.{i}    -> patch_embed_blocks/block{i}
      enc_stages.{s}.down.fc|norm      -> enc{s}_down/fc|norm
      enc_stages.{s}.blocks.blocks.{i} -> enc{s}_blocks/block{i}
      dec_stages.{s}.up.proj*/...      -> dec{s}_up/proj*, proj*_norm
      dec_stages.{s}.blocks.blocks.{i} -> dec{s}_blocks/block{i}
      seg_head.{0,1.norm,3}            -> seg_head_fc1|norm|fc2
    Block internals: attn.linear_q.0 -> attn/linear_q (+ .1.norm -> bn_q),
    linear_p_bias/multiplier Sequentials -> pe_*_fc1/bn/fc2,
    weight_encoding -> weight_fc1/bn/fc2, fc1/fc3/norm{1,2,3}.
    """
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    used = set()
    filled = set()

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def put_dense(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        _assign(params, fpath + ("kernel",), w.T, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_bn(tkey, fpath):
        for suffix, tree, leaf in (
            (".weight", params, "scale"), (".bias", params, "bias"),
            (".running_mean", batch_stats, "mean"),
            (".running_var", batch_stats, "var"),
        ):
            w = torch_get(tkey + suffix)
            if w is not None:
                _assign(tree, fpath + ("norm", leaf), w, filled)
        torch_get(tkey + ".num_batches_tracked")

    def put_block(t, f):
        put_dense(f"{t}.fc1", f + ("fc1",))
        put_dense(f"{t}.fc3", f + ("fc3",))
        for j in (1, 2, 3):
            put_bn(f"{t}.norm{j}.norm", f + (f"norm{j}",))
        a, fa = f"{t}.attn", f + ("attn",)
        put_dense(f"{a}.linear_q.0", fa + ("linear_q",))
        put_bn(f"{a}.linear_q.1.norm", fa + ("bn_q",))
        put_dense(f"{a}.linear_k.0", fa + ("linear_k",))
        put_bn(f"{a}.linear_k.1.norm", fa + ("bn_k",))
        put_dense(f"{a}.linear_v", fa + ("linear_v",))
        put_dense(f"{a}.linear_p_bias.0", fa + ("pe_bias_fc1",))
        put_bn(f"{a}.linear_p_bias.1.norm", fa + ("pe_bias_bn",))
        put_dense(f"{a}.linear_p_bias.3", fa + ("pe_bias_fc2",))
        put_dense(f"{a}.linear_p_multiplier.0", fa + ("pe_mul_fc1",))
        put_bn(f"{a}.linear_p_multiplier.1.norm", fa + ("pe_mul_bn",))
        put_dense(f"{a}.linear_p_multiplier.3", fa + ("pe_mul_fc2",))
        put_dense(f"{a}.weight_encoding.0", fa + ("weight_fc1",))
        put_bn(f"{a}.weight_encoding.1.norm", fa + ("weight_bn",))
        put_dense(f"{a}.weight_encoding.3", fa + ("weight_fc2",))
        # PT-v2m1 GroupedLinear weight [1, C]
        gl = torch_get(f"{a}.weight_encoding.0.weight")
        if gl is not None and gl.ndim == 2 and gl.shape[0] == 1:
            _assign(params, fa + ("grouped_weight",), gl, filled)

    put_dense("patch_embed.proj.0", ("patch_embed_proj",))
    put_bn("patch_embed.proj.1.norm", ("patch_embed_norm",))
    put_dense("seg_head.0", ("seg_head_fc1",))
    put_bn("seg_head.1.norm", ("seg_head_norm",))
    put_dense("seg_head.3", ("seg_head_fc2",))

    for name in list(params.keys()):
        m = re.fullmatch(r"patch_embed_blocks", name)
        if m:
            for bname in params[name]:
                i = bname.replace("block", "")
                put_block(f"patch_embed.blocks.blocks.{i}", (name, bname))
            continue
        m = re.fullmatch(r"enc(\d+)_down", name)
        if m:
            s = m.group(1)
            put_dense(f"enc_stages.{s}.down.fc", (name, "fc"))
            put_bn(f"enc_stages.{s}.down.norm.norm", (name, "norm"))
            continue
        m = re.fullmatch(r"(enc|dec)(\d+)_blocks", name)
        if m:
            side, s = m.group(1), m.group(2)
            for bname in params[name]:
                i = bname.replace("block", "")
                put_block(f"{side}_stages.{s}.blocks.blocks.{i}",
                          (name, bname))
            continue
        m = re.fullmatch(r"dec(\d+)_up", name)
        if m:
            s = m.group(1)
            put_dense(f"dec_stages.{s}.up.proj.0", (name, "proj"))
            put_bn(f"dec_stages.{s}.up.proj.1.norm", (name, "proj_norm"))
            put_dense(f"dec_stages.{s}.up.proj_skip.0", (name, "proj_skip"))
            put_bn(f"dec_stages.{s}.up.proj_skip.1.norm",
                   (name, "proj_skip_norm"))
            continue

    report = {
        "unused_torch_keys": sorted(k for k in torch_state if k not in used),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def convert_ptv1_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_prefix: str = "backbone.",
):
    """Fill flax PTv1 (PointTransformerSeg) params from a reference state
    dict (point_transformer_seg.py:195-303 key layout).

    enc{s}.0 (TransitionDown) -> enc{s}_down/linear|bn
    enc{s}.{i} (Bottleneck)   -> enc{s}_block{i-1}/...
    dec{s}.0 (TransitionUp)   -> dec{s}_up/linear1|bn1|linear2|bn2
    dec{s}.1 (Bottleneck)     -> dec{s}_block0/...
    cls.{0,1,3}               -> cls_fc1 | cls_bn | cls_fc2
    Bottleneck.transformer2   -> .../transformer (linear_q/k/v,
      linear_p.{0,1,3} -> linear_p_fc1/bn/fc2,
      linear_w.{0,2,3,5} -> linear_w_bn1/fc1/bn2/fc2)
    """
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    used = set()
    filled = set()

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def put_dense(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        _assign(params, fpath + ("kernel",), w.T, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_bn(tkey, fpath):
        for suffix, tree, leaf in (
            (".weight", params, "scale"), (".bias", params, "bias"),
            (".running_mean", batch_stats, "mean"),
            (".running_var", batch_stats, "var"),
        ):
            w = torch_get(tkey + suffix)
            if w is not None:
                _assign(tree, fpath + ("norm", leaf), w, filled)
        torch_get(tkey + ".num_batches_tracked")

    def put_bottleneck(t, f):
        put_dense(f"{t}.linear1", f + ("linear1",))
        put_bn(f"{t}.bn1", f + ("bn1",))
        put_dense(f"{t}.linear3", f + ("linear3",))
        put_bn(f"{t}.bn2", f + ("bn2",))
        put_bn(f"{t}.bn3", f + ("bn3",))
        # Bottleneck names it `transformer` (seg.py:178); other block
        # variants use `transformer2`
        a = (f"{t}.transformer"
             if backbone_prefix + f"{t}.transformer.linear_q.weight"
             in torch_state else f"{t}.transformer2")
        fa = f + ("transformer",)
        for nm in ("linear_q", "linear_k", "linear_v"):
            put_dense(f"{a}.{nm}", fa + (nm,))
        put_dense(f"{a}.linear_p.0", fa + ("linear_p_fc1",))
        put_bn(f"{a}.linear_p.1", fa + ("linear_p_bn",))
        put_dense(f"{a}.linear_p.3", fa + ("linear_p_fc2",))
        put_bn(f"{a}.linear_w.0", fa + ("linear_w_bn1",))
        put_dense(f"{a}.linear_w.2", fa + ("linear_w_fc1",))
        put_bn(f"{a}.linear_w.3", fa + ("linear_w_bn2",))
        put_dense(f"{a}.linear_w.5", fa + ("linear_w_fc2",))

    put_dense("cls.0", ("cls_fc1",))
    put_bn("cls.1", ("cls_bn",))
    put_dense("cls.3", ("cls_fc2",))

    for name in list(params.keys()):
        m = re.fullmatch(r"enc(\d+)_down", name)
        if m:
            s = m.group(1)
            put_dense(f"enc{s}.0.linear", (name, "linear"))
            put_bn(f"enc{s}.0.bn", (name, "bn"))
            continue
        m = re.fullmatch(r"(enc|dec)(\d+)_block(\d+)", name)
        if m:
            side, s, i = m.group(1), m.group(2), int(m.group(3))
            off = 1  # module 0 is the transition
            put_bottleneck(f"{side}{s}.{i + off}", (name,))
            continue
        m = re.fullmatch(r"dec(\d+)_up", name)
        if m:
            s = m.group(1)
            put_dense(f"dec{s}.0.linear1.0", (name, "linear1"))
            put_bn(f"dec{s}.0.linear1.1", (name, "bn1"))
            put_dense(f"dec{s}.0.linear2.0", (name, "linear2"))
            put_bn(f"dec{s}.0.linear2.1", (name, "bn2"))
            # PartSeg head: shape-category embedding
            # (point_transformer_partseg.py:144-146)
            put_dense(f"dec{s}.0.linear3.0", (name, "linear3"))
            continue

    report = {
        "unused_torch_keys": sorted(k for k in torch_state if k not in used),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def convert_oacnns_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_prefix: str = "backbone.",
):
    """Fill flax OACNNs params from a reference OACNNs state dict
    (oacnns_v1m1_base.py:214-345 key layout).

    stem.{0,3,6} / .{1,4,7}           -> stem{i} / stem{i}_norm
    enc.{i}.down.{0,1}                -> enc{i}_down / enc{i}_down_norm
    enc.{i}.blocks.{d}.*              -> enc{i}_block{d}/...
      l_w.{j}.{0,1} -> l_w{j}/fc|norm; weight.{j} -> weight{j};
      proj.{j}.{0,1} -> proj{j} (last -> proj_last); adaptive; fuse.{0,1};
      voxel_block.{0,1,3,4} -> vconv1|vnorm1|vconv2|vnorm2
    dec.{i}.up.{0,1}                  -> dec{i}_up / dec{i}_up_norm
    dec.{i}.fuse.{0,1,3,4}            -> dec{i}_fuse1/fc|norm,
                                         dec{i}_fuse2_fc|_fuse2_norm
    final ([1,1,1,C,K] SubM k=1)      -> final (Dense)
    """
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    used = set()
    filled = set()

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def put_dense(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        _assign(params, fpath + ("kernel",), w.T, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_bn(tkey, fpath):
        """fpath = path of the BN leaves themselves (bare MaskedBatchNorm
        modules keep scale/bias at their own name; _LinBNReLU nests them
        under <module>/norm — callers append "norm" in that case)."""
        for suffix, tree, leaf in (
            (".weight", params, "scale"), (".bias", params, "bias"),
            (".running_mean", batch_stats, "mean"),
            (".running_var", batch_stats, "var"),
        ):
            w = torch_get(tkey + suffix)
            if w is not None:
                _assign(tree, fpath + (leaf,), w, filled)
        torch_get(tkey + ".num_batches_tracked")

    def put_conv(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        tmpl = _lookup(params, fpath + ("kernel",))
        if tmpl is None:
            return
        k3, cin, cout = tmpl.shape
        _assign(params, fpath + ("kernel",), _conv_kernel(w, cin, cout),
                filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_pointwise(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        if w.ndim == 5:
            if w.shape[:3] == (1, 1, 1):
                w = w.reshape(w.shape[3], w.shape[4])
            else:
                w = w.reshape(w.shape[0], w.shape[4]).T
        _assign(params, fpath + ("kernel",), w, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    for i in range(3):
        put_conv(f"stem.{3 * i}", (f"stem{i}",))
        put_bn(f"stem.{3 * i + 1}", (f"stem{i}_norm",))
    put_pointwise("final", ("final",))

    def put_block(t, f):
        scales = sorted(
            int(k.replace("l_w", ""))
            for k in _lookup(params, f) if re.fullmatch(r"l_w\d+", k)
        )
        for j in scales:
            put_dense(f"{t}.l_w.{j}.0", f + (f"l_w{j}", "fc"))
            put_bn(f"{t}.l_w.{j}.1", f + (f"l_w{j}", "norm"))
            put_dense(f"{t}.weight.{j}", f + (f"weight{j}",))
            put_dense(f"{t}.proj.{j}.0", f + (f"proj{j}", "fc"))
            put_bn(f"{t}.proj.{j}.1", f + (f"proj{j}", "norm"))
        last = len(scales)
        put_dense(f"{t}.proj.{last}.0", f + ("proj_last", "fc"))
        put_bn(f"{t}.proj.{last}.1", f + ("proj_last", "norm"))
        put_dense(f"{t}.adaptive", f + ("adaptive",))
        put_dense(f"{t}.fuse.0", f + ("fuse", "fc"))
        put_bn(f"{t}.fuse.1", f + ("fuse", "norm"))
        put_conv(f"{t}.voxel_block.0", f + ("vconv1",))
        put_bn(f"{t}.voxel_block.1", f + ("vnorm1",))
        put_conv(f"{t}.voxel_block.3", f + ("vconv2",))
        put_bn(f"{t}.voxel_block.4", f + ("vnorm2",))

    for name in list(params.keys()):
        m = re.fullmatch(r"enc(\d+)_down", name)
        if m:
            s = m.group(1)
            put_conv(f"enc.{s}.down.0", (name,))
            put_bn(f"enc.{s}.down.1", (f"enc{s}_down_norm",))
            continue
        m = re.fullmatch(r"enc(\d+)_block(\d+)", name)
        if m:
            put_block(f"enc.{m.group(1)}.blocks.{m.group(2)}", (name,))
            continue
        m = re.fullmatch(r"dec(\d+)_up", name)
        if m:
            s = m.group(1)
            put_conv(f"dec.{s}.up.0", (name,))
            put_bn(f"dec.{s}.up.1", (f"dec{s}_up_norm",))
            put_dense(f"dec.{s}.fuse.0", (f"dec{s}_fuse1", "fc"))
            put_bn(f"dec.{s}.fuse.1", (f"dec{s}_fuse1", "norm"))
            put_dense(f"dec.{s}.fuse.3", (f"dec{s}_fuse2_fc",))
            put_bn(f"dec.{s}.fuse.4", (f"dec{s}_fuse2_norm",))
            continue

    # BN inside our _LinBNReLU lives at <name>/norm; put_bn wrote to
    # <name>/norm/* via ("norm", leaf) appended to the given path
    report = {
        "unused_torch_keys": sorted(k for k in torch_state if k not in used),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def convert_spvcnn_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_prefix: str = "backbone.",
):
    """Fill flax SPVCNN params from a reference torchsparse SPVCNN state
    dict (ts_spvcnn.py:178-440 key layout; conv weights are ``kernel``
    [k^3, in, out], or [in, out] for k=1).

    stem.{0,3} / .{1,4}            -> stem{0,1}/conv | /norm
    stage{s}.0.net.{0,1}           -> stage{s}_down | _down_norm
    stage{s}.{i}.net / .downsample -> stage{s}_block{i-1}/...
    up{j}.0.net.{0,1}              -> up{j}_deconv | _deconv_norm
    up{j}.1.{i}.net                -> up{j}_block{i}/...
    point_transforms.{t}.{0,1}     -> point_transform{t}_fc | _norm
    classifier.0                   -> classifier
    """
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    used = set()
    filled = set()

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def put_kernel(tkey, fpath, transpose_dense=False):
        w = torch_get(tkey + ".kernel")
        if w is None:
            w = torch_get(tkey + ".weight")
            if w is not None and transpose_dense:
                w = w.T
        if w is None:
            return
        _assign(params, fpath + ("kernel",), w, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_bn(tkey, fpath):
        for suffix, tree, leaf in (
            (".weight", params, "scale"), (".bias", params, "bias"),
            (".running_mean", batch_stats, "mean"),
            (".running_var", batch_stats, "var"),
        ):
            w = torch_get(tkey + suffix)
            if w is not None:
                _assign(tree, fpath + (leaf,), w, filled)
        torch_get(tkey + ".num_batches_tracked")

    def put_res_block(t, f):
        put_kernel(f"{t}.net.0", f + ("conv1",))
        put_bn(f"{t}.net.1", f + ("norm1",))
        put_kernel(f"{t}.net.3", f + ("conv2",))
        put_bn(f"{t}.net.4", f + ("norm2",))
        put_kernel(f"{t}.downsample.0", f + ("downsample",))
        put_bn(f"{t}.downsample.1", f + ("downsample_norm",))

    put_kernel("stem.0", ("stem0", "conv"))
    put_bn("stem.1", ("stem0", "norm"))
    put_kernel("stem.3", ("stem1", "conv"))
    put_bn("stem.4", ("stem1", "norm"))
    put_kernel("classifier.0", ("classifier",), transpose_dense=True)
    for t in range(3):
        w = torch_get(f"point_transforms.{t}.0.weight")
        if w is not None:
            _assign(params, (f"point_transform{t}_fc", "kernel"), w.T, filled)
        b = torch_get(f"point_transforms.{t}.0.bias")
        if b is not None:
            _assign(params, (f"point_transform{t}_fc", "bias"), b, filled)
        put_bn(f"point_transforms.{t}.1", (f"point_transform{t}_norm",))

    for name in list(params.keys()):
        m = re.fullmatch(r"stage(\d+)_down", name)
        if m:
            s = m.group(1)
            put_kernel(f"stage{s}.0.net.0", (name,))
            put_bn(f"stage{s}.0.net.1", (f"stage{s}_down_norm",))
            continue
        m = re.fullmatch(r"stage(\d+)_block(\d+)", name)
        if m:
            s, i = m.group(1), int(m.group(2))
            put_res_block(f"stage{s}.{i + 1}", (name,))
            continue
        m = re.fullmatch(r"up(\d+)_deconv", name)
        if m:
            j = m.group(1)
            put_kernel(f"up{j}.0.net.0", (name,))
            put_bn(f"up{j}.0.net.1", (f"up{j}_deconv_norm",))
            continue
        m = re.fullmatch(r"up(\d+)_block(\d+)", name)
        if m:
            j, i = m.group(1), m.group(2)
            put_res_block(f"up{j}.1.{i}", (name,))
            continue

    report = {
        "unused_torch_keys": sorted(k for k in torch_state if k not in used),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def convert_mink_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_prefix: str = "backbone.",
):
    """Fill flax MinkUNet params from a reference MinkowskiEngine MinkUNet
    state dict (sparse_unet/mink_unet.py:159-362 layout; conv weights are
    ``kernel`` [k^3, in, out] or [in, out] for k=1; BNs nest under ``.bn``).

    conv0p1s1 / bn0.bn        -> conv0 / bn0
    conv{s}p*s2 / bn{s}.bn    -> conv{s}_down / bn{s}
    block{s}.{i}.*            -> enc{s}_block{i}/... (s 1..4)
    convtr{j}p*s2 / bntr{j}   -> convtr{j} / bntr{j}
    block{5+d}.{i}.*          -> dec{4+d}_block{i}/...
    final.kernel|bias         -> final (Dense)
    """
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    used = set()
    filled = set()

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def put_kernel(tkey, fpath):
        w = torch_get(tkey + ".kernel")
        if w is None:
            return
        _assign(params, fpath + ("kernel",), w, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_bn(tkey, fpath):
        for suffix, tree, leaf in (
            (".bn.weight", params, "scale"), (".bn.bias", params, "bias"),
            (".bn.running_mean", batch_stats, "mean"),
            (".bn.running_var", batch_stats, "var"),
        ):
            w = torch_get(tkey + suffix)
            if w is not None:
                _assign(tree, fpath + (leaf,), w, filled)
        torch_get(tkey + ".bn.num_batches_tracked")

    def put_block(t, f):
        for j in (1, 2, 3):
            put_kernel(f"{t}.conv{j}", f + (f"conv{j}",))
            put_bn(f"{t}.norm{j}", f + (f"norm{j}",))
        put_kernel(f"{t}.downsample.0", f + ("downsample",))
        put_bn(f"{t}.downsample.1", f + ("downsample_norm",))

    put_kernel("conv0p1s1", ("conv0",))
    put_bn("bn0", ("bn0",))
    put_kernel("final", ("final",))
    strides = {1: 1, 2: 2, 3: 4, 4: 8}  # conv{s}p{stride_in}s2 names
    for s in range(1, 5):
        put_kernel(f"conv{s}p{strides[s]}s2", (f"conv{s}_down",))
        put_bn(f"bn{s}", (f"bn{s}",))
    tr_strides = {4: 16, 5: 8, 6: 4, 7: 2}
    for j in range(4, 8):
        put_kernel(f"convtr{j}p{tr_strides[j]}s2", (f"convtr{j}",))
        put_bn(f"bntr{j}", (f"bntr{j}",))
    for name in list(params.keys()):
        m = re.fullmatch(r"enc(\d+)_block(\d+)", name)
        if m:
            put_block(f"block{m.group(1)}.{m.group(2)}", (name,))
            continue
        m = re.fullmatch(r"dec(\d+)_block(\d+)", name)
        if m:
            d = int(m.group(1))  # dec4..dec7 <-> block5..block8
            put_block(f"block{d + 1}.{m.group(2)}", (name,))
            continue

    report = {
        "unused_torch_keys": sorted(k for k in torch_state if k not in used),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def convert_cac_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
):
    """Fill flax CACSegmentor params from a reference CAC-v1m1 state dict
    (context_aware_classifier_v1m1_base.py:17-63): the SpUNet backbone goes
    through convert_spunet_checkpoint under ``backbone_module``; the head
    maps seg_head -> seg_kernel/seg_bias (prototype matrix transposed),
    proj/apd_proj Sequentials -> *_fc1/_fc2, feat_proj_layer ->
    feat_fc1 + feat_norm (flax BatchNorm) + feat_fc2."""
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    bb_state = {
        k[len("backbone."):]: v
        for k, v in torch_state.items() if k.startswith("backbone.")
    }
    bb_params, bb_stats, bb_report = convert_spunet_checkpoint(
        bb_state,
        params["backbone_module"],
        batch_stats.get("backbone_module", {}),
        backbone_prefix="",
    )
    params["backbone_module"] = bb_params
    if "backbone_module" in batch_stats:
        batch_stats["backbone_module"] = bb_stats
    used = set()
    filled = set()

    def torch_get(key):
        if key in torch_state:
            used.add(key)
            return torch_state[key]
        return None

    def put_dense(tkey, fname):
        w = torch_get(tkey + ".weight")
        if w is not None:
            _assign(params, (fname, "kernel"), w.T, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, (fname, "bias"), b, filled)

    w = torch_get("seg_head.weight")
    if w is not None:
        _assign(params, ("seg_kernel",), w.T, filled)
    b = torch_get("seg_head.bias")
    if b is not None:
        _assign(params, ("seg_bias",), b, filled)
    put_dense("proj.0", "proj_fc1")
    put_dense("proj.2", "proj_fc2")
    put_dense("apd_proj.0", "apd_fc1")
    put_dense("apd_proj.2", "apd_fc2")
    put_dense("feat_proj_layer.0", "feat_fc1")
    put_dense("feat_proj_layer.3", "feat_fc2")
    for suffix, tree, leaf in (
        (".weight", params, "scale"), (".bias", params, "bias"),
        (".running_mean", batch_stats, "mean"),
        (".running_var", batch_stats, "var"),
    ):
        v = torch_get("feat_proj_layer.1" + suffix)
        if v is not None:
            _assign(tree, ("feat_norm", leaf), v, filled)
    torch_get("feat_proj_layer.1.num_batches_tracked")

    report = {
        "unused_torch_keys": sorted(
            ["backbone." + k for k in bb_report["unused_torch_keys"]]
            + [k for k in torch_state
               if not k.startswith("backbone.") and k not in used]
        ),
        "filled_leaves": len(filled) + bb_report["filled_leaves"],
    }
    return params, batch_stats, report


def convert_pointgroup_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
):
    """Fill flax PointGroup params from a reference PG-v1m1 state dict
    (point_group_v1m1_base.py:24-58): SpUNet backbone under
    ``backbone_module`` + bias_head.{0,1,3} -> bias_fc1/bias_norm/bias_fc2
    and seg_head."""
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    bb_state = {
        k[len("backbone."):]: v
        for k, v in torch_state.items() if k.startswith("backbone.")
    }
    bb_params, bb_stats, bb_report = convert_spunet_checkpoint(
        bb_state, params["backbone_module"],
        batch_stats.get("backbone_module", {}), backbone_prefix="",
    )
    params["backbone_module"] = bb_params
    if "backbone_module" in batch_stats:
        batch_stats["backbone_module"] = bb_stats
    used = set()
    filled = set()

    def torch_get(key):
        if key in torch_state:
            used.add(key)
            return torch_state[key]
        return None

    for tkey, fname in (("bias_head.0", "bias_fc1"),
                        ("bias_head.3", "bias_fc2"),
                        ("seg_head", "seg_head")):
        w = torch_get(tkey + ".weight")
        if w is not None:
            _assign(params, (fname, "kernel"), w.T, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, (fname, "bias"), b, filled)
    for suffix, tree, leaf in (
        (".weight", params, "scale"), (".bias", params, "bias"),
        (".running_mean", batch_stats, "mean"),
        (".running_var", batch_stats, "var"),
    ):
        v = torch_get("bias_head.1" + suffix)
        if v is not None:
            _assign(tree, ("bias_norm", leaf), v, filled)
    torch_get("bias_head.1.num_batches_tracked")

    report = {
        "unused_torch_keys": sorted(
            ["backbone." + k for k in bb_report["unused_torch_keys"]]
            + [k for k in torch_state
               if not k.startswith("backbone.") and k not in used]
        ),
        "filled_leaves": len(filled) + bb_report["filled_leaves"],
    }
    return params, batch_stats, report


def convert_spunet_v1m3_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    num_conditions: int,
    backbone_prefix: str = "backbone.",
):
    """Fill flax SpUNet-v1m3 (PDNorm) params from a reference
    spconv_unet_v1m3_pdnorm state dict (l.231-438 layout: SPConvPatchEmbed/
    SPConvDown/SPConvUp wrappers with ``conv``/``bn`` attrs; PDBatchNorm
    ``bns.{c}`` per condition + ``modulation.1`` adaptive Linear; blocks use
    proj_conv/proj_norm instead of v1m1's proj Sequential)."""
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    used = set()
    filled = set()

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def put_conv(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        tmpl = _lookup(params, fpath + ("kernel",))
        if tmpl is None:
            return
        if tmpl.ndim == 2:  # pointwise: [1,1,1,in,out]-ish -> Dense
            if w.ndim == 5:
                w = (w.reshape(w.shape[3], w.shape[4])
                     if w.shape[:3] == (1, 1, 1)
                     else w.reshape(w.shape[0], w.shape[4]).T)
            _assign(params, fpath + ("kernel",), w, filled)
        else:
            k3, cin, cout = tmpl.shape
            _assign(params, fpath + ("kernel",), _conv_kernel(w, cin, cout),
                    filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_pd(tkey, fpath):
        """PDBatchNorm -> <fpath>/pdnorm/{norm{c}, modulation}."""
        base = fpath + ("pdnorm",)
        for c in range(num_conditions):
            for suffix, tree, leaf in (
                (".weight", params, "scale"), (".bias", params, "bias"),
                (".running_mean", batch_stats, "mean"),
                (".running_var", batch_stats, "var"),
            ):
                v = torch_get(f"{tkey}.bns.{c}{suffix}")
                if v is not None:
                    _assign(tree, base + (f"norm{c}", leaf), v, filled)
            torch_get(f"{tkey}.bns.{c}.num_batches_tracked")
        w = torch_get(tkey + ".modulation.1.weight")
        if w is not None:
            _assign(params, base + ("modulation", "kernel"), w.T, filled)
        b = torch_get(tkey + ".modulation.1.bias")
        if b is not None:
            _assign(params, base + ("modulation", "bias"), b, filled)

    put_conv("conv_input.conv", ("conv_input",))
    put_pd("conv_input.bn", ("norm_input",))
    put_conv("final", ("final",))
    fb = torch_get("final.bias")
    if fb is not None:
        _assign(params, ("final", "bias"), fb, filled)

    for name in list(params.keys()):
        m = re.fullmatch(r"down(\d+)", name)
        if m:
            s = m.group(1)
            put_conv(f"down.{s}.conv", (name,))
            put_pd(f"down.{s}.bn", (f"down{s}_norm",))
            continue
        m = re.fullmatch(r"up(\d+)", name)
        if m:
            s = m.group(1)
            put_conv(f"up.{s}.conv", (name,))
            put_pd(f"up.{s}.bn", (f"up{s}_norm",))
            continue
        m = re.fullmatch(r"(enc|dec)(\d+)_block(\d+)", name)
        if m:
            t = f"{m.group(1)}.{m.group(2)}.block{m.group(3)}"
            put_conv(f"{t}.conv1", (name, "conv1"))
            put_conv(f"{t}.conv2", (name, "conv2"))
            put_pd(f"{t}.bn1", (name, "bn1"))
            put_pd(f"{t}.bn2", (name, "bn2"))
            put_conv(f"{t}.proj_conv", (name, "proj"))
            put_pd(f"{t}.proj_norm", (name, "proj_norm"))
            continue

    report = {
        "unused_torch_keys": sorted(k for k in torch_state if k not in used),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def convert_ppt_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    num_conditions: int,
):
    """Fill flax PPT-v1m1 params from a reference
    point_prompt_training_v1m1 state dict: the SpUNet-v1m3 backbone under
    ``backbone_module`` (convert_spunet_v1m3_checkpoint), plus
    embedding_table, proj_head, logit_scale, and the class_embedding
    buffer (returned separately — it lives in our 'constants' collection)."""
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    bb_state = {
        k[len("backbone."):]: v
        for k, v in torch_state.items() if k.startswith("backbone.")
    }
    bb_params, bb_stats, bb_report = convert_spunet_v1m3_checkpoint(
        bb_state, params["backbone_module"],
        batch_stats.get("backbone_module", {}),
        num_conditions=num_conditions, backbone_prefix="",
    )
    params["backbone_module"] = bb_params
    if "backbone_module" in batch_stats:
        batch_stats["backbone_module"] = bb_stats
    used = set()
    filled = set()

    def torch_get(key):
        if key in torch_state:
            used.add(key)
            return torch_state[key]
        return None

    w = torch_get("embedding_table.weight")
    if w is not None:
        _assign(params, ("embedding_table", "embedding"), w, filled)
    w = torch_get("proj_head.weight")
    if w is not None:
        _assign(params, ("proj_head", "kernel"), w.T, filled)
    b = torch_get("proj_head.bias")
    if b is not None:
        _assign(params, ("proj_head", "bias"), b, filled)
    ls = torch_get("logit_scale")
    if ls is not None:
        _assign(params, ("logit_scale",), np.asarray(ls).reshape(()), filled)
    class_embedding = torch_get("class_embedding")

    report = {
        "unused_torch_keys": sorted(
            ["backbone." + k for k in bb_report["unused_torch_keys"]]
            + [k for k in torch_state
               if not k.startswith("backbone.") and k not in used]
        ),
        "filled_leaves": len(filled) + bb_report["filled_leaves"],
        "class_embedding": class_embedding,
    }
    return params, batch_stats, report


def convert_ppt_v1m2_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    num_conditions: int,
):
    """PPT-v1m2 (decoupled heads): v1m3 backbone + embedding_table +
    seg_heads.{i} — each reference head is [num_cls_i, C]; ours pad to
    max(num_classes) columns, so the head kernels fill a leading slice."""
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    bb_state = {
        k[len("backbone."):]: v
        for k, v in torch_state.items() if k.startswith("backbone.")
    }
    bb_params, bb_stats, bb_report = convert_spunet_v1m3_checkpoint(
        bb_state, params["backbone_module"],
        batch_stats.get("backbone_module", {}),
        num_conditions=num_conditions, backbone_prefix="",
    )
    params["backbone_module"] = bb_params
    if "backbone_module" in batch_stats:
        batch_stats["backbone_module"] = bb_stats
    used = set()
    filled = set()

    def torch_get(key):
        if key in torch_state:
            used.add(key)
            return torch_state[key]
        return None

    w = torch_get("embedding_table.weight")
    if w is not None:
        _assign(params, ("embedding_table", "embedding"), w, filled)
    for i in range(num_conditions):
        w = torch_get(f"seg_heads.{i}.weight")
        if w is None:
            continue
        tmpl = _lookup(params, (f"seg_head{i}", "kernel"))
        k = np.array(tmpl)
        k[:, : w.shape[0]] = w.T
        _assign(params, (f"seg_head{i}", "kernel"), k, filled)
        b = torch_get(f"seg_heads.{i}.bias")
        if b is not None:
            bb = np.array(_lookup(params, (f"seg_head{i}", "bias")))
            bb[: b.shape[0]] = b
            _assign(params, (f"seg_head{i}", "bias"), bb, filled)

    report = {
        "unused_torch_keys": sorted(
            ["backbone." + k for k in bb_report["unused_torch_keys"]]
            + [k for k in torch_state
               if not k.startswith("backbone.") and k not in used]
        ),
        "filled_leaves": len(filled) + bb_report["filled_leaves"],
    }
    return params, batch_stats, report


def convert_stratified_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_prefix: str = "backbone.",
):
    """Fill flax ST-v1m2 params/batch_stats from a reference
    StratifiedTransformer state dict
    (stratified_transformer_v1m2_refine.py:593-760 key layout).

    torch -> flax:
      point_embed.0.kpconv / .bn        -> embed0_kpconv / embed0_bn
      point_embed.1.unary_{1,2}.{0,1}   -> embed1_unary{1,2} / embed1_bn{1,2}
      point_embed.1.kpconv              -> embed1_kpconv
      down.norm|linear                  -> stem_down_norm|stem_down_fc
      layers.{i}.blocks.{j}.*           -> layer{i}_block{j}/*
      layers.{i}.down.norm|linear       -> layer{i}_down_norm|fc
      up.{j}.linear1.{0,1}              -> up{L-2-j}_norm1|fc1 (stem: up_stem_*)
      up.{j}.linear2.{0,1}              -> up{...}_norm2|fc2
      classifier.{0,1,3}                -> cls_fc1|cls_bn|cls_fc2
    KPConv kernels are [P, Cin, Cout] on both sides (direct copy); the
    non-trainable K_points dispositions transfer only if the shapes agree
    (torch_points3d's Lloyd layout vs this framework's Fibonacci layout is a
    config-level difference — see models/stratified.py docstring).
    """
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    used = set()
    filled = set()

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def put_dense(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        _assign(params, fpath + ("kernel",), w.T, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_ln(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is None:
            return
        _assign(params, fpath + ("scale",), w, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_bn(tkey, fpath):
        for suffix, tree, leaf in (
            (".weight", params, "scale"), (".bias", params, "bias"),
            (".running_mean", batch_stats, "mean"),
            (".running_var", batch_stats, "var"),
        ):
            w = torch_get(tkey + suffix)
            if w is not None:
                _assign(tree, fpath + ("norm", leaf), w, filled)
        torch_get(tkey + ".num_batches_tracked")

    def put_kpconv(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is not None:
            _assign(params, fpath + ("kernel",), w, filled)
        torch_get(tkey + ".K_points")  # constant disposition, not a weight

    # stem
    put_kpconv("point_embed.0.kpconv", ("embed0_kpconv",))
    put_bn("point_embed.0.bn.batch_norm", ("embed0_bn",))
    put_dense("point_embed.1.unary_1.0", ("embed1_unary1",))
    put_bn("point_embed.1.unary_1.1.batch_norm", ("embed1_bn1",))
    put_kpconv("point_embed.1.kpconv", ("embed1_kpconv",))
    put_dense("point_embed.1.unary_2.0", ("embed1_unary2",))
    put_bn("point_embed.1.unary_2.1.batch_norm", ("embed1_bn2",))
    # KPConvResBlock declares self.bn but its forward never applies it
    # (reference l.567-591); consume the dead keys so reports stay clean
    put_bn("point_embed.1.bn.batch_norm", ("embed1_dead_bn",))
    put_ln("down.norm", ("stem_down_norm",))
    put_dense("down.linear", ("stem_down_fc",))

    # encoder stages
    for name in list(params.keys()):
        m = re.fullmatch(r"layer(\d+)_block(\d+)", name)
        if m:
            i, j = m.group(1), m.group(2)
            t = f"layers.{i}.blocks.{j}"
            put_ln(f"{t}.norm1", (name, "norm1"))
            put_ln(f"{t}.norm2", (name, "norm2"))
            put_dense(f"{t}.attn.qkv", (name, "attn", "qkv"))
            put_dense(f"{t}.attn.proj", (name, "attn", "proj"))
            for tbl in ("relative_pos_query_table", "relative_pos_key_table",
                        "relative_pos_value_table"):
                w = torch_get(f"{t}.attn.{tbl}")
                if w is not None:
                    _assign(params, (name, "attn", tbl), w, filled)
            put_dense(f"{t}.mlp.fc1", (name, "mlp_fc1"))
            put_dense(f"{t}.mlp.fc2", (name, "mlp_fc2"))
            continue
        m = re.fullmatch(r"layer(\d+)_down_norm", name)
        if m:
            put_ln(f"layers.{m.group(1)}.down.norm", (name,))
            continue
        m = re.fullmatch(r"layer(\d+)_down_fc", name)
        if m:
            put_dense(f"layers.{m.group(1)}.down.linear", (name,))
            continue

    # decoder TransitionUps: reference up.{j} for j in 0..L-2 covers
    # channels[L-1-j+1] -> channels[L-1-j]; our up{li} uses li = L-2-j
    num_layers = len([k for k in params if re.fullmatch(r"layer(\d+)_block0", k)])
    for j in range(max(num_layers - 1, 0)):
        li = num_layers - 2 - j
        put_ln(f"up.{j}.linear1.0", (f"up{li}_norm1",))
        put_dense(f"up.{j}.linear1.1", (f"up{li}_fc1",))
        put_ln(f"up.{j}.linear2.0", (f"up{li}_norm2",))
        put_dense(f"up.{j}.linear2.1", (f"up{li}_fc2",))
    if "up_stem_norm1" in params:
        j = num_layers - 1
        put_ln(f"up.{j}.linear1.0", ("up_stem_norm1",))
        put_dense(f"up.{j}.linear1.1", ("up_stem_fc1",))
        put_ln(f"up.{j}.linear2.0", ("up_stem_norm2",))
        put_dense(f"up.{j}.linear2.1", ("up_stem_fc2",))

    put_dense("classifier.0", ("cls_fc1",))
    put_bn("classifier.1", ("cls_bn",))
    put_dense("classifier.3", ("cls_fc2",))

    report = {
        "unused_torch_keys": sorted(k for k in torch_state if k not in used),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def convert_msc_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_converter=None,
):
    """Fill flax MaskedSceneContrast (MSC-v1m1) params from a reference
    state dict (masked_scene_contrast_v1m1_base.py:24-67): the wrapped
    backbone delegates to ``backbone_converter`` (default
    convert_spunet_checkpoint) under the ``backbone.`` prefix; wrapper
    leaves are mask_token [1, Cin] -> (Cin,) plus the color/normal Linear
    heads."""
    import jax

    if backbone_converter is None:
        backbone_converter = convert_spunet_checkpoint
    bk_params, bk_stats, bk_report = backbone_converter(
        torch_state, params_template["backbone_module"],
        batch_stats_template.get("backbone_module", {}),
        backbone_prefix="backbone.",
    )
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    params["backbone_module"] = bk_params
    if bk_stats:
        batch_stats["backbone_module"] = bk_stats
    used = set()
    filled = set()

    w = torch_state.get("mask_token")
    if w is not None:
        used.add("mask_token")
        _assign(params, ("mask_token",), np.asarray(w).reshape(-1), filled)
    for head in ("color_head", "normal_head"):
        w = torch_state.get(f"{head}.weight")
        if w is not None:
            used.add(f"{head}.weight")
            _assign(params, (head, "kernel"), np.asarray(w).T, filled)
        b = torch_state.get(f"{head}.bias")
        if b is not None:
            used.add(f"{head}.bias")
            _assign(params, (head, "bias"), b, filled)

    unused = [
        k for k in bk_report["unused_torch_keys"]
        if k not in used and not k.startswith("backbone.")
    ]
    backbone_unused = [
        k for k in bk_report["unused_torch_keys"] if k.startswith("backbone.")
    ]
    report = {
        "unused_torch_keys": sorted(unused + backbone_unused),
        "filled_leaves": len(filled) + bk_report["filled_leaves"],
    }
    return params, batch_stats, report


def convert_octformer_checkpoint(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    backbone_prefix: str = "backbone.",
):
    """Fill flax OctFormer params from a reference OctFormer-v1m1 state dict
    (octformer_v1m1_base.py:507-577 key layout).

    ocnn conv weights arrive either as [kdim, Cin, Cout] or flattened
    tap-major [kdim*Cin, Cout] (ocnn's octree2col matmul layout); both are
    normalized to this framework's [kdim, Cin, Cout] with taps enumerated
    x-major — k3: itertools.product((-1,0,1)^3); k2s2: (x&1)<<2|(y&1)<<1|(z&1)
    (ops.subm_conv.kernel_offsets / ops.sparse_conv.kernel_tap). Real ocnn's
    tap enumeration is not verifiable offline — same caveat class as spconv
    KRSC (PARITY.md).

    patch_embed.convs.{i}.{conv,bn}       -> embed{i}_conv / embed{i}_norm
    patch_embed.downsamples.{i}           -> embed{i}_down_conv / _norm
    patch_embed.proj                      -> embed_proj_conv / _norm
    layers.{s}.blocks.{i}.*               -> stage{s}_block{i}/*
    downsamples.{s}.{conv,norm}           -> down{s}_conv / down{s}_norm
    decoder.conv1x1.{i}                   -> fpn_fc{i}
    decoder.conv3x3.{i}.{conv,bn}         -> fpn_conv{i}_conv / _norm
    decoder.up_conv.{i}.{conv,bn}         -> up_conv{i} / up_conv{i}_norm
    seg_head.{0,1,3}                      -> seg_fc1 / seg_norm / seg_fc2
    """
    import jax

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), params_template
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), batch_stats_template
    )
    used = set()
    filled = set()

    def torch_get(key):
        full = backbone_prefix + key
        if full in torch_state:
            used.add(full)
            return torch_state[full]
        return None

    def ocnn_kernel(w, template):
        kdim, cin, cout = template.shape
        if w.shape == (kdim, cin, cout):
            return w
        if w.shape == (kdim * cin, cout):
            return w.reshape(kdim, cin, cout)
        raise ValueError(
            f"unrecognized ocnn kernel shape {w.shape} for {template.shape}"
        )

    def put_conv(tkey, fpath):
        w = torch_get(tkey + ".weights")
        if w is None:
            return
        tmpl = _lookup(params, fpath + ("kernel",))
        _assign(params, fpath + ("kernel",), ocnn_kernel(w, tmpl), filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_dense(tkey, fpath):
        w = torch_get(tkey + ".weight")
        if w is not None:
            _assign(params, fpath + ("kernel",), w.T, filled)
        b = torch_get(tkey + ".bias")
        if b is not None:
            _assign(params, fpath + ("bias",), b, filled)

    def put_bn(tkey, fpath):
        for suffix, tree, leaf in (
            (".weight", params, "scale"), (".bias", params, "bias"),
            (".running_mean", batch_stats, "mean"),
            (".running_var", batch_stats, "var"),
        ):
            w = torch_get(tkey + suffix)
            if w is not None:
                _assign(tree, fpath + (leaf,), w, filled)
        torch_get(tkey + ".num_batches_tracked")

    def put_ln(tkey, fpath):
        for suffix, leaf in ((".weight", "scale"), (".bias", "bias")):
            w = torch_get(tkey + suffix)
            if w is not None:
                _assign(params, fpath + (leaf,), w, filled)

    stem_down = sum(
        1 for k in params if re.fullmatch(r"embed(\d+)_conv", k)
    )
    for i in range(stem_down):
        put_conv(f"patch_embed.convs.{i}.conv", (f"embed{i}_conv",))
        put_bn(f"patch_embed.convs.{i}.bn", (f"embed{i}_norm",))
        put_conv(f"patch_embed.downsamples.{i}.conv", (f"embed{i}_down_conv",))
        put_bn(f"patch_embed.downsamples.{i}.bn", (f"embed{i}_down_norm",))
    put_conv("patch_embed.proj.conv", ("embed_proj_conv",))
    put_bn("patch_embed.proj.bn", ("embed_proj_norm",))

    for name in list(params.keys()):
        m = re.fullmatch(r"stage(\d+)_block(\d+)", name)
        if m:
            s, i = m.group(1), m.group(2)
            t = f"layers.{s}.blocks.{i}"
            w = torch_get(f"{t}.cpe.conv.weights")
            if w is not None:
                _assign(params, (name, "cpe_weight"), w, filled)
            put_bn(f"{t}.cpe.bn", (name, "cpe_norm"))
            put_ln(f"{t}.norm1", (name, "norm1"))
            put_dense(f"{t}.attention.qkv", (name, "attention", "qkv"))
            put_dense(f"{t}.attention.proj", (name, "attention", "proj"))
            w = torch_get(f"{t}.attention.rpe.rpe_table")
            if w is not None:
                _assign(params, (name, "attention", "rpe_table"), w, filled)
            put_ln(f"{t}.norm2", (name, "norm2"))
            put_dense(f"{t}.mlp.fc1", (name, "mlp_fc1"))
            put_dense(f"{t}.mlp.fc2", (name, "mlp_fc2"))
            continue
        m = re.fullmatch(r"down(\d+)_conv", name)
        if m:
            s = m.group(1)
            put_conv(f"downsamples.{s}.conv", (name,))
            put_bn(f"downsamples.{s}.norm", (f"down{s}_norm",))
            continue
        m = re.fullmatch(r"fpn_fc(\d+)", name)
        if m:
            put_dense(f"decoder.conv1x1.{m.group(1)}", (name,))
            continue
        m = re.fullmatch(r"fpn_conv(\d+)_conv", name)
        if m:
            i = m.group(1)
            put_conv(f"decoder.conv3x3.{i}.conv", (name,))
            put_bn(f"decoder.conv3x3.{i}.bn", (f"fpn_conv{i}_norm",))
            continue
        m = re.fullmatch(r"up_conv(\d+)", name)
        if m:
            i = m.group(1)
            put_conv(f"decoder.up_conv.{i}.conv", (name,))
            put_bn(f"decoder.up_conv.{i}.bn", (f"up_conv{i}_norm",))
            continue

    put_dense("seg_head.0", ("seg_fc1",))
    put_bn("seg_head.1", ("seg_norm",))
    put_dense("seg_head.3", ("seg_fc2",))

    report = {
        "unused_torch_keys": sorted(k for k in torch_state if k not in used),
        "filled_leaves": len(filled),
    }
    return params, batch_stats, report


def export_ptv3_lang_checkpoint(
    params,
    batch_stats,
    backbone_prefix: str = "backbone.",
    flax_backbone_key: str = "backbone_module",
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_ptv3_lang_checkpoint`: emit a reference-
    loadable torch state dict (numpy values) from flax params/batch_stats.

    Lets models trained here migrate BACK to the reference stack
    (pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:518
    key layout; ``model.load_state_dict(..., strict=True)`` round-trips in
    tests/test_export_bridge.py). SubMConv kernels are emitted in spconv2's
    [k, k, k, in, out] layout — the same layout the import goldens pin via
    the executable spconv stub (tests/ref_exec_stubs.py) — and every
    BatchNorm gets an int64 ``num_batches_tracked`` zero so strict loads
    succeed.
    """
    out: Dict[str, np.ndarray] = {}
    bb_params = params.get(flax_backbone_key, params) if flax_backbone_key \
        else params
    bb_stats = (batch_stats.get(flax_backbone_key, batch_stats)
                if flax_backbone_key else batch_stats)

    def get(fpath, stats=False):
        v = _lookup(bb_stats if stats else bb_params, fpath)
        return None if v is None else np.asarray(v)

    def put(tkey, value):
        out[backbone_prefix + tkey] = np.asarray(value)

    def put_dense(tkey, fpath):
        w = get(fpath + ("kernel",))
        if w is None:
            return
        put(tkey + ".weight", w.T)
        b = get(fpath + ("bias",))
        if b is not None:
            put(tkey + ".bias", b)

    def put_ln(tkey, fpath):
        w = get(fpath + ("scale",))
        if w is None:
            return
        put(tkey + ".weight", w)
        b = get(fpath + ("bias",))
        if b is not None:
            put(tkey + ".bias", b)

    def put_bn(tkey, fpath):
        put_ln(tkey, fpath)
        rm = get(fpath + ("mean",), stats=True)
        rv = get(fpath + ("var",), stats=True)
        if rm is not None:
            put(tkey + ".running_mean", rm)
        if rv is not None:
            put(tkey + ".running_var", rv)
        if rm is not None or rv is not None:
            put(tkey + ".num_batches_tracked", np.zeros((), np.int64))

    def put_conv(tkey, fpath):
        w = get(fpath + ("kernel",))
        if w is None:
            return
        k3, cin, cout = w.shape
        k = round(k3 ** (1 / 3))
        assert k * k * k == k3, f"non-cubic conv kernel {w.shape}"
        put(tkey + ".weight", w.reshape(k, k, k, cin, cout))
        b = get(fpath + ("bias",))
        if b is not None:
            put(tkey + ".bias", b)

    put_conv("embedding.stem.conv", ("embedding", "conv"))
    put_bn("embedding.stem.norm", ("embedding", "norm"))
    mt = get(("mask_token",))
    if mt is not None:
        put("mask_token", mt.reshape(1, -1))

    for name in sorted(bb_params.keys()):
        m = re.fullmatch(r"(enc|dec)(\d+)_block(\d+)", name)
        if m:
            side, s, i = m.group(1), m.group(2), m.group(3)
            t = f"{side}.{side}{s}.block{i}"
            put_conv(f"{t}.cpe.0", (name, "cpe_conv"))
            put_dense(f"{t}.cpe.1", (name, "cpe_linear"))
            put_ln(f"{t}.cpe.2", (name, "cpe_norm"))
            put_ln(f"{t}.norm1.0", (name, "norm1"))
            put_ln(f"{t}.norm2.0", (name, "norm2"))
            put_dense(f"{t}.attn.qkv", (name, "attn", "qkv"))
            put_dense(f"{t}.attn.proj", (name, "attn", "proj"))
            rpe = get((name, "attn", "rpe_table"))
            if rpe is not None:
                put(f"{t}.attn.rpe.rpe_table", rpe)
            put_dense(f"{t}.mlp.0.fc1", (name, "mlp", "fc1"))
            put_dense(f"{t}.mlp.0.fc2", (name, "mlp", "fc2"))
            continue
        m = re.fullmatch(r"enc(\d+)_down", name)
        if m:
            s = m.group(1)
            put_dense(f"enc.enc{s}.down.proj", (name, "proj"))
            put_bn(f"enc.enc{s}.down.norm.0", (name, "norm"))
            continue
        m = re.fullmatch(r"dec(\d+)_up", name)
        if m:
            s = m.group(1)
            put_dense(f"dec.dec{s}.up.proj.0", (name, "proj"))
            put_bn(f"dec.dec{s}.up.proj.1", (name, "proj_norm"))
            put_dense(f"dec.dec{s}.up.proj_skip.0", (name, "proj_skip"))
            put_bn(f"dec.dec{s}.up.proj_skip.1", (name, "proj_skip_norm"))
            continue

    return out


def _lookup(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _assign(tree, path, value, filled):
    node = tree
    for p in path[:-1]:
        if p not in node:
            return
        node = node[p]
    leaf = node.get(path[-1])
    if leaf is None:
        return
    # copy: torch state-dict values arrive as numpy VIEWS of live tensor
    # storage — without the copy, later in-place torch updates (e.g. EMA
    # teacher momentum) silently mutate the bridged tree
    value = np.array(value, dtype=leaf.dtype)
    if leaf.shape != value.shape:
        # shape-mismatch skipping, like the reference CheckpointLoader
        return
    node[path[-1]] = value
    filled.add("/".join(path))
