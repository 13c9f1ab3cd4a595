"""Reference-checkpoint migration: torch state dicts -> flax variables.

The reference repo checkpoints its models with
``torch.save({'model': model.state_dict(), ...})`` (train_1.py:186,
train_3.py:168, train_5.py:336).  These converters map those state dicts
(key -> numpy array; call ``.numpy()`` on torch tensors first or pass
tensors — both accepted) onto this framework's flax parameter trees so a
trained reference model keeps its exact function.

Layout conventions converted here:
- torch ``nn.Linear`` weight is (out, in); flax ``nn.Dense`` kernel is
  (in, out) -> transpose.
- torch ``nn.Conv2d`` weight is (O, I, kH, kW); flax ``nn.Conv`` kernel is
  (kH, kW, I, O) -> transpose(2, 3, 1, 0).
- torch ``nn.ConvTranspose2d`` weight is (I, O, kH, kW); flax
  ``nn.ConvTranspose`` (non-transposed-kernel convention) needs the spatially
  FLIPPED kernel in (kH, kW, I, O): ``w[:, :, ::-1, ::-1].transpose(2,3,0,1)``
  (verified numerically: torch (k=4, s=2, p=1) == flax (4, 2, 'SAME')).
- torch BatchNorm weight/bias/running_mean/running_var -> flax
  scale/bias (params) + mean/var (batch_stats); eps 1e-5 both sides.

Model mappings (reference file:line -> this framework):
- ``LinearModel``  (phase1_lifting/baselineModel.py:50-102) -> MartinezLifter
- ``AE``           (baselineModel.py:135-215, active encoder2/decoder2 path)
                   -> AELifter
- ``MyViT``        (baselineModel.py:312-362) -> JointTransformerLifter
- ``ResNet``       (phase3_direct/my_HybrIK/Resnet.py:98-165) -> ResNet
                   (delegates to models.resnet.load_torch_resnet)
- ``Model_3D``     (phase3_direct/my_HybrIK/Model.py:12-191) -> PoseNet3D
- ``Model_2D``     (phase5_loop/Model_2d.py:13-138) -> PoseNet2D
- ``Projection``   (phase5_loop/Model_2d.py:140-170) -> ProjectionMLP
"""

from __future__ import annotations

import numpy as np


def _np(v):
    """torch tensor or array-like -> numpy array."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _dense(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _scale_bias(sd, prefix):
    """BatchNorm/LayerNorm affine params (torch stores both as weight/bias)."""
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _bn_stats(sd, prefix):
    return {"mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"])}


def _conv(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _deconv(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])  # (I, O, kH, kW)
    return {"kernel": w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()}


def martinez_from_torch(sd, num_stages: int = 2):
    """``LinearModel`` state dict -> MartinezLifter variables."""
    params = {
        "Dense_0": _dense(sd, "w1"),
        "BatchNorm_0": _scale_bias(sd, "batch_norm1"),
        "Dense_1": _dense(sd, "w2"),
    }
    stats = {"BatchNorm_0": _bn_stats(sd, "batch_norm1")}
    for i in range(num_stages):
        t = f"linear_stages.{i}"
        params[f"MartinezBlock_{i}"] = {
            "Dense_0": _dense(sd, f"{t}.w1"),
            "BatchNorm_0": _scale_bias(sd, f"{t}.batch_norm1"),
            "Dense_1": _dense(sd, f"{t}.w2"),
            "BatchNorm_1": _scale_bias(sd, f"{t}.batch_norm2"),
        }
        stats[f"MartinezBlock_{i}"] = {
            "BatchNorm_0": _bn_stats(sd, f"{t}.batch_norm1"),
            "BatchNorm_1": _bn_stats(sd, f"{t}.batch_norm2"),
        }
    return {"params": params, "batch_stats": stats}


def ae_from_torch(sd):
    """``AE`` state dict (active encoder2/decoder2 path,
    baselineModel.py:186-205) -> AELifter variables. The dead
    encoder/decoder branches of the reference module are ignored."""
    params, stats = {}, {}
    # encoder2: Flatten(0) Linear(1) BN(2) ReLU Drop | Linear(5) BN(6) ...
    # decoder2: Linear(0) BN(1) ReLU Drop | Linear(4)
    torch_layers = [("encoder2.1", "encoder2.2"), ("encoder2.5", "encoder2.6"),
                    ("decoder2.0", "decoder2.1")]
    for i, (lin, bn) in enumerate(torch_layers):
        params[f"Dense_{i}"] = _dense(sd, lin)
        params[f"BatchNorm_{i}"] = _scale_bias(sd, bn)
        stats[f"BatchNorm_{i}"] = _bn_stats(sd, bn)
    params["Dense_3"] = _dense(sd, "decoder2.4")
    return {"params": params, "batch_stats": stats}


def vit_lifter_from_torch(sd, n_blocks: int = 2):
    """``MyViT`` state dict -> JointTransformerLifter variables.

    The fixed sinusoidal positional embedding (baselineModel.py:329-330) is
    recomputed, not copied — ``sinusoidal_positional_embeddings`` reproduces
    the reference formula exactly (tested in test_reference_parity.py).
    """
    params = {
        "Dense_0": _dense(sd, "linear_mapper"),
        "Dense_1": _dense(sd, "mlp.0"),
        "Dense_2": _dense(sd, "mlp.2"),
    }
    for i in range(n_blocks):
        b = f"blocks.{i}"
        params[f"TransformerBlock_{i}"] = {
            "LayerNorm_0": _scale_bias(sd, f"{b}.norm1"),
            "JointAttention_0": {
                "LayerNorm_0": _scale_bias(sd, f"{b}.mhsa.norm"),
                "Dense_0": _dense(sd, f"{b}.mhsa.to_qkv"),
                "Dense_1": _dense(sd, f"{b}.mhsa.to_out"),
            },
            "LayerNorm_1": _scale_bias(sd, f"{b}.norm2"),
            "Dense_0": _dense(sd, f"{b}.mlp.0"),
            "Dense_1": _dense(sd, f"{b}.mlp.2"),
        }
    return {"params": params}


def projection_from_torch(sd):
    """``Projection`` (phase5_loop/Model_2d.py:140-170) -> ProjectionMLP."""
    params, stats = {}, {}
    # mlp: Flatten(0) [Linear BN Tanh Drop] x3 at (1,2),(5,6),(9,10), Linear(13)
    for i, (lin, bn) in enumerate([("mlp.1", "mlp.2"), ("mlp.5", "mlp.6"),
                                   ("mlp.9", "mlp.10")]):
        params[f"Dense_{i}"] = _dense(sd, lin)
        params[f"BatchNorm_{i}"] = _scale_bias(sd, bn)
        stats[f"BatchNorm_{i}"] = _bn_stats(sd, bn)
    params["Dense_3"] = _dense(sd, "mlp.13")
    return {"params": params, "batch_stats": stats}


def resnet_from_torch(flax_variables, sd, prefix: str = ""):
    """Reference/torchvision-format ResNet state dict -> flax ResNet
    variables, via models.resnet.load_torch_resnet (warm-start-by-merge
    semantics of Model.py:30-38). ``prefix`` strips e.g. ``"preact."``."""
    from flax.core import unfreeze

    from pose3d_tpu.models.resnet import load_torch_resnet

    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    sd = {k: _np(v) for k, v in sd.items()}
    params, stats, n = load_torch_resnet(
        flax_variables["params"], flax_variables["batch_stats"], sd
    )
    return {"params": unfreeze(params), "batch_stats": unfreeze(stats)}, n


def _deconv_head_from_torch(sd, deconv_prefix="deconv_layers",
                            final_prefix="final_layer"):
    """Deconv stack (Model.py:66-88) + 1x1 final conv -> DeconvHead tree.
    torch Sequential slots: deconv at 0/3/6, BN at 1/4/7."""
    params = {"Conv_0": _conv(sd, final_prefix)}
    stats = {}
    for i, slot in enumerate((0, 3, 6)):
        params[f"ConvTranspose_{i}"] = _deconv(sd, f"{deconv_prefix}.{slot}")
        params[f"BatchNorm_{i}"] = _scale_bias(sd, f"{deconv_prefix}.{slot + 1}")
        stats[f"BatchNorm_{i}"] = _bn_stats(sd, f"{deconv_prefix}.{slot + 1}")
    return params, stats


def posenet3d_from_torch(flax_variables, sd):
    """``Model_3D`` state dict -> PoseNet3D variables.

    The backbone (``preact.*``) goes through the ResNet merge; the deconv
    head and final 1x1 conv are mapped exactly. The reference's dead
    camera-embedding MLP (Model.py:50-64) is ignored.
    """
    out, n = resnet_from_torch(
        {"params": flax_variables["params"]["backbone"],
         "batch_stats": flax_variables["batch_stats"]["backbone"]},
        sd, prefix="preact.",
    )
    head_params, head_stats = _deconv_head_from_torch(sd)
    return {
        "params": {"backbone": out["params"], "head": head_params},
        "batch_stats": {"backbone": out["batch_stats"], "head": head_stats},
    }, n


def posenet2d_from_torch(flax_variables, sd):
    """``Model_2D`` state dict -> PoseNet2D variables (same structure as
    Model_3D with depth_dim=1, Model_2d.py:13-138)."""
    return posenet3d_from_torch(flax_variables, sd)


# ---------------------------------------------------------------------------
# Reverse direction: flax variables -> reference-format torch state dicts
# (numpy-valued; `torch.save({'model': {k: torch.from_numpy(v), ...}})`-ready).
# Makes checkpoint interop bidirectional so models trained here can be
# loaded by the reference trainers (train_1.py:43-46, train_3.py:35-38).
# ---------------------------------------------------------------------------


def _dense_out(params, prefix, sd):
    sd[f"{prefix}.weight"] = _np(params["kernel"]).T
    if "bias" in params:
        sd[f"{prefix}.bias"] = _np(params["bias"])


def _scale_bias_out(params, prefix, sd):
    sd[f"{prefix}.weight"] = _np(params["scale"])
    sd[f"{prefix}.bias"] = _np(params["bias"])


def _bn_stats_out(stats, prefix, sd):
    sd[f"{prefix}.running_mean"] = _np(stats["mean"])
    sd[f"{prefix}.running_var"] = _np(stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _conv_out(params, prefix, sd):
    sd[f"{prefix}.weight"] = _np(params["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in params:
        sd[f"{prefix}.bias"] = _np(params["bias"])


def _deconv_out(params, prefix, sd):
    # inverse of _deconv: (kH, kW, I, O) -> (I, O, kH, kW), then un-flip
    w = _np(params["kernel"]).transpose(2, 3, 0, 1)
    sd[f"{prefix}.weight"] = w[:, :, ::-1, ::-1].copy()


def martinez_to_torch(variables, num_stages: int = 2):
    """MartinezLifter variables -> ``LinearModel`` state dict."""
    p, s = variables["params"], variables["batch_stats"]
    sd = {}
    _dense_out(p["Dense_0"], "w1", sd)
    _scale_bias_out(p["BatchNorm_0"], "batch_norm1", sd)
    _bn_stats_out(s["BatchNorm_0"], "batch_norm1", sd)
    _dense_out(p["Dense_1"], "w2", sd)
    for i in range(num_stages):
        bp, bs = p[f"MartinezBlock_{i}"], s[f"MartinezBlock_{i}"]
        t = f"linear_stages.{i}"
        _dense_out(bp["Dense_0"], f"{t}.w1", sd)
        _scale_bias_out(bp["BatchNorm_0"], f"{t}.batch_norm1", sd)
        _bn_stats_out(bs["BatchNorm_0"], f"{t}.batch_norm1", sd)
        _dense_out(bp["Dense_1"], f"{t}.w2", sd)
        _scale_bias_out(bp["BatchNorm_1"], f"{t}.batch_norm2", sd)
        _bn_stats_out(bs["BatchNorm_1"], f"{t}.batch_norm2", sd)
    return sd


def ae_to_torch(variables):
    """AELifter variables -> ``AE`` state dict (active encoder2/decoder2)."""
    p, s = variables["params"], variables["batch_stats"]
    sd = {}
    torch_layers = [("encoder2.1", "encoder2.2"), ("encoder2.5", "encoder2.6"),
                    ("decoder2.0", "decoder2.1")]
    for i, (lin, bn) in enumerate(torch_layers):
        _dense_out(p[f"Dense_{i}"], lin, sd)
        _scale_bias_out(p[f"BatchNorm_{i}"], bn, sd)
        _bn_stats_out(s[f"BatchNorm_{i}"], bn, sd)
    _dense_out(p["Dense_3"], "decoder2.4", sd)
    return sd


def vit_lifter_to_torch(variables, n_blocks: int = 2):
    """JointTransformerLifter variables -> ``MyViT`` state dict (the fixed
    sinusoidal PE is a non-trainable buffer the reference recreates)."""
    p = variables["params"]
    sd = {}
    _dense_out(p["Dense_0"], "linear_mapper", sd)
    _dense_out(p["Dense_1"], "mlp.0", sd)
    _dense_out(p["Dense_2"], "mlp.2", sd)
    for i in range(n_blocks):
        bp = p[f"TransformerBlock_{i}"]
        b = f"blocks.{i}"
        _scale_bias_out(bp["LayerNorm_0"], f"{b}.norm1", sd)
        _scale_bias_out(bp["JointAttention_0"]["LayerNorm_0"],
                        f"{b}.mhsa.norm", sd)
        _dense_out(bp["JointAttention_0"]["Dense_0"], f"{b}.mhsa.to_qkv", sd)
        _dense_out(bp["JointAttention_0"]["Dense_1"], f"{b}.mhsa.to_out", sd)
        _scale_bias_out(bp["LayerNorm_1"], f"{b}.norm2", sd)
        _dense_out(bp["Dense_0"], f"{b}.mlp.0", sd)
        _dense_out(bp["Dense_1"], f"{b}.mlp.2", sd)
    return sd


def projection_to_torch(variables):
    """ProjectionMLP variables -> ``Projection`` state dict."""
    p, s = variables["params"], variables["batch_stats"]
    sd = {}
    for i, (lin, bn) in enumerate([("mlp.1", "mlp.2"), ("mlp.5", "mlp.6"),
                                   ("mlp.9", "mlp.10")]):
        _dense_out(p[f"Dense_{i}"], lin, sd)
        _scale_bias_out(p[f"BatchNorm_{i}"], bn, sd)
        _bn_stats_out(s[f"BatchNorm_{i}"], bn, sd)
    _dense_out(p["Dense_3"], "mlp.13", sd)
    return sd


def resnet_to_torch(variables, prefix: str = ""):
    """flax ResNet variables -> reference/torchvision-format state dict."""
    p, s = variables["params"], variables["batch_stats"]
    sd = {}
    sd[f"{prefix}conv1.weight"] = _np(p["stem_conv"]["kernel"]) \
        .transpose(3, 2, 0, 1)
    _scale_bias_out(p["stem_bn"], f"{prefix}bn1", sd)
    _bn_stats_out(s["stem_bn"], f"{prefix}bn1", sd)
    stage_map = {"stage1": "layer1", "stage2": "layer2",
                 "stage3": "layer3", "stage4": "layer4"}
    for block_name in sorted(k for k in p if "_block" in k):
        stage, idx = block_name.split("_block")
        tprefix = f"{prefix}{stage_map[stage]}.{idx}"
        bp, bs = p[block_name], s[block_name]
        convs = sorted(k for k in bp if k.startswith("Conv_"))
        # BasicBlock leads with a 3x3; Bottleneck with a 1x1. The trailing
        # conv is the downsample iff there is one more conv than the block
        # body (2 for Basic, 3 for Bottleneck).
        basic = bp["Conv_0"]["kernel"].shape[0] == 3
        body = 2 if basic else 3
        for i in range(body):
            _conv_out(bp[f"Conv_{i}"], f"{tprefix}.conv{i + 1}", sd)
            _scale_bias_out(bp[f"BatchNorm_{i}"], f"{tprefix}.bn{i + 1}", sd)
            _bn_stats_out(bs[f"BatchNorm_{i}"], f"{tprefix}.bn{i + 1}", sd)
        if len(convs) > body:
            _conv_out(bp[f"Conv_{body}"], f"{tprefix}.downsample.0", sd)
            _scale_bias_out(bp[f"BatchNorm_{body}"],
                            f"{tprefix}.downsample.1", sd)
            _bn_stats_out(bs[f"BatchNorm_{body}"],
                          f"{tprefix}.downsample.1", sd)
    return sd


def posenet3d_to_torch(variables):
    """PoseNet3D variables -> ``Model_3D`` state dict (backbone under
    ``preact.``, deconv stack at slots 0/3/6, BNs at 1/4/7, 1x1 final)."""
    sd = resnet_to_torch(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        prefix="preact.",
    )
    hp = variables["params"]["head"]
    hs = variables["batch_stats"]["head"]
    for i, slot in enumerate((0, 3, 6)):
        _deconv_out(hp[f"ConvTranspose_{i}"], f"deconv_layers.{slot}", sd)
        _scale_bias_out(hp[f"BatchNorm_{i}"], f"deconv_layers.{slot + 1}", sd)
        _bn_stats_out(hs[f"BatchNorm_{i}"], f"deconv_layers.{slot + 1}", sd)
    _conv_out(hp["Conv_0"], "final_layer", sd)
    return sd


def posenet2d_to_torch(variables):
    """PoseNet2D variables -> ``Model_2D`` state dict."""
    return posenet3d_to_torch(variables)
