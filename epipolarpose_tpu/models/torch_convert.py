"""Two-way converter: reference PyTorch checkpoints <-> Flax variables.

SURVEY.md §5 calls for a ``.pth.tar -> flax`` converter so released
simple-baselines / EpipolarPose checkpoints can be loaded for MPJPE-parity
runs once available (torch-cpu is installed for exactly this).

Name mapping (reference state_dict -> this package's Flax tree):
  conv1.weight                    -> params/conv1/kernel        (OIHW->HWIO)
  bn1.{weight,bias}               -> params/bn1/{scale,bias}
  bn1.running_{mean,var}          -> batch_stats/bn1/{mean,var}
  layer{i}.{b}.conv{k}.weight     -> params/layer{i}_{b}/Conv_{k-1}/kernel
  layer{i}.{b}.bn{k}.*            -> params/layer{i}_{b}/bn{k}/*
  layer{i}.{b}.downsample.0.weight-> params/layer{i}_{b}/downsample_conv/kernel
  layer{i}.{b}.downsample.1.*     -> params/layer{i}_{b}/downsample_bn/*
  deconv_layers.{3m}.weight       -> params/deconv{m+1}/kernel  (IOHW->HWOI,
                                     flipped: torch ConvTranspose correlates,
                                     flax ConvTranspose convolves)
  deconv_layers.{3m+1}.*          -> params/deconv_bn{m+1}/*
  final_layer.{weight,bias}       -> params/final_layer/{kernel,bias}
"""

from __future__ import annotations

import re

import numpy as np


def _conv_kernel(w) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _deconv_kernel(w) -> np.ndarray:
    """torch ConvTranspose IOHW -> flax ConvTranspose HWIO, spatially flipped.

    torch's ConvTranspose2d is the gradient of a correlation; flax's
    ConvTranspose is the transpose of a convolution — the kernels differ by
    a spatial flip in addition to the axis order.
    """
    w = np.asarray(w)                       # (I, O, kH, kW)
    w = np.transpose(w, (2, 3, 0, 1))       # HWIO
    return w[::-1, ::-1]


def convert_state_dict(state_dict, num_layers: int):
    """Reference ``state_dict`` (name -> numpy) -> {'params':…,'batch_stats':…}.

    Accepts either raw backbone checkpoints or full PoseResNet ones; torch
    tensors or numpy arrays as values.
    """
    from epipolarpose_tpu.models.pose_resnet import RESNET_SPEC
    block_name, _ = RESNET_SPEC[num_layers]
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def bn(dst_params, dst_stats, src_prefix, items):
        for tname, fname, tree, dst in (
            ("weight", "scale", params, dst_params),
            ("bias", "bias", params, dst_params),
            ("running_mean", "mean", stats, dst_stats),
            ("running_var", "var", stats, dst_stats),
        ):
            key = f"{src_prefix}.{tname}"
            if key in items:
                put(tree, dst + [fname], items[key])

    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}

    if "conv1.weight" in sd:
        put(params, ["conv1", "kernel"], _conv_kernel(sd["conv1.weight"]))
    bn(["bn1"], ["bn1"], "bn1", sd)

    layer_re = re.compile(r"^layer(\d+)\.(\d+)\.(.+)$")
    for key, val in sd.items():
        m = layer_re.match(key)
        if not m:
            continue
        li, bi, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        blk = f"layer{li}_{bi}"
        cm = re.match(r"conv(\d)\.weight", rest)
        if cm:
            put(params, [blk, f"Conv_{int(cm.group(1)) - 1}", "kernel"],
                _conv_kernel(val))
            continue
        bm = re.match(r"bn(\d)\.", rest)
        if bm:
            bn([blk, f"bn{bm.group(1)}"], [blk, f"bn{bm.group(1)}"],
               f"layer{li}.{bi}.bn{bm.group(1)}", sd)
            continue
        if rest == "downsample.0.weight":
            put(params, [blk, "downsample_conv", "kernel"], _conv_kernel(val))
        elif rest.startswith("downsample.1."):
            bn([blk, "downsample_bn"], [blk, "downsample_bn"],
               f"layer{li}.{bi}.downsample.1", sd)

    dec_re = re.compile(r"^deconv_layers\.(\d+)\.(weight|bias|running_mean|"
                        r"running_var)$")
    for key, val in sd.items():
        m = dec_re.match(key)
        if not m:
            continue
        idx, tname = int(m.group(1)), m.group(2)
        stage, kind = divmod(idx, 3)          # (conv, bn, relu) triplets
        if kind == 0 and tname == "weight":
            put(params, [f"deconv{stage + 1}", "kernel"], _deconv_kernel(val))
        elif kind == 1:
            bn([f"deconv_bn{stage + 1}"], [f"deconv_bn{stage + 1}"],
               f"deconv_layers.{idx}", sd)

    if "final_layer.weight" in sd:
        put(params, ["final_layer", "kernel"],
            _conv_kernel(sd["final_layer.weight"]))
    if "final_layer.bias" in sd:
        put(params, ["final_layer", "bias"], sd["final_layer.bias"])

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, num_layers: int):
    """Load a ``.pth.tar`` checkpoint file and convert (requires torch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_state_dict(sd, num_layers)


def _inv_conv_kernel(w) -> np.ndarray:
    """flax HWIO -> torch conv OIHW."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _inv_deconv_kernel(w) -> np.ndarray:
    """flax ConvTranspose HWIO (flipped) -> torch ConvTranspose IOHW."""
    w = np.asarray(w)[::-1, ::-1]           # undo the spatial flip
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))  # IOHW


def export_state_dict(variables) -> dict:
    """Flax ``{'params':…,'batch_stats':…}`` -> reference torch state_dict.

    Exact inverse of :func:`convert_state_dict`: weights trained with this
    framework load into the reference's PyTorch ``PoseResNet`` with
    ``strict=True`` (``num_batches_tracked`` entries are emitted as 0, as
    ``torch.save``-fresh reference checkpoints carry them). Values are
    float32 numpy arrays keyed by reference names (module prefix omitted,
    like the reference's released single-GPU checkpoints).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: dict = {}

    def bn(src_p, src_s, dst_prefix):
        out[f"{dst_prefix}.weight"] = np.asarray(src_p["scale"], np.float32)
        out[f"{dst_prefix}.bias"] = np.asarray(src_p["bias"], np.float32)
        s = src_s if src_s is not None else {}
        n = np.asarray(src_p["scale"]).shape[0]
        out[f"{dst_prefix}.running_mean"] = np.asarray(
            s.get("mean", np.zeros(n)), np.float32)
        out[f"{dst_prefix}.running_var"] = np.asarray(
            s.get("var", np.ones(n)), np.float32)
        out[f"{dst_prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    blk_re = re.compile(r"^layer(\d+)_(\d+)$")
    dec_re = re.compile(r"^deconv(\d+)$")
    for name, node in params.items():
        if name == "conv1":
            out["conv1.weight"] = _inv_conv_kernel(node["kernel"])
        elif name == "bn1":
            bn(node, stats.get("bn1"), "bn1")
        elif name == "final_layer":
            out["final_layer.weight"] = _inv_conv_kernel(node["kernel"])
            out["final_layer.bias"] = np.asarray(node["bias"], np.float32)
        elif blk_re.match(name):
            li, bi = blk_re.match(name).groups()
            blk_stats = stats.get(name, {})
            for sub, val in node.items():
                cm = re.match(r"^Conv_(\d+)$", sub)
                bm = re.match(r"^bn(\d+)$", sub)
                if cm:
                    out[f"layer{li}.{bi}.conv{int(cm.group(1)) + 1}"
                        f".weight"] = _inv_conv_kernel(val["kernel"])
                elif bm:
                    bn(val, blk_stats.get(sub),
                       f"layer{li}.{bi}.bn{bm.group(1)}")
                elif sub == "downsample_conv":
                    out[f"layer{li}.{bi}.downsample.0.weight"] = \
                        _inv_conv_kernel(val["kernel"])
                elif sub == "downsample_bn":
                    bn(val, blk_stats.get(sub),
                       f"layer{li}.{bi}.downsample.1")
        elif dec_re.match(name):
            stage = int(dec_re.match(name).group(1)) - 1
            out[f"deconv_layers.{3 * stage}.weight"] = \
                _inv_deconv_kernel(node["kernel"])
            if "bias" in node:              # DECONV_WITH_BIAS: true
                out[f"deconv_layers.{3 * stage}.bias"] = np.asarray(
                    node["bias"], np.float32)
        elif name.startswith("deconv_bn"):
            stage = int(name[len("deconv_bn"):]) - 1
            bn(node, stats.get(name), f"deconv_layers.{3 * stage + 1}")

    return out


def save_torch_checkpoint(path: str, variables) -> None:
    """Write Flax variables as a reference-format ``.pth.tar`` file."""
    import torch
    # copy=True: flax arrays surface as non-writable numpy views, which
    # torch.from_numpy rejects with a UB warning
    sd = {k: torch.from_numpy(np.array(v, copy=True)) if np.ndim(v)
          else torch.tensor(v) for k, v in export_state_dict(variables).items()}
    torch.save({"state_dict": sd}, path)
