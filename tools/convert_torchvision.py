#!/usr/bin/env python
"""Convert torchvision ResNet ImageNet weights to this framework's flax
layout (weights/<model>.npz), for --classifier_pretrained parity with
model.py:15-23 of the reference.

Two sources:

  * ``--state_dict ckpt.pth`` — a torch checkpoint in torchvision's
    ResNet key layout (``conv1.weight``, ``layer1.0.conv1.weight``, ...).
    Needs only torch (in this image), so the converter runs end-to-end
    here (tests/test_pretrained.py exercises it against a synthetically
    constructed torchvision-layout checkpoint).
  * default — download via torchvision itself; needs a host that has
    torchvision + egress:
        python tools/convert_torchvision.py resnet18 weights/resnet18.npz

Layout written (flat dict):
    conv_init/kernel            (7,7,3,64)   HWIO
    bn_init/{scale,bias}        + batch_stats bn_init/{mean,var}
    layer{i}_{j}/<block params> matching models/resnet.py module names
    fc is NOT converted (the reference retrains the task head,
    model.py:22).
"""

import argparse

import numpy as np

STAGE_SIZES = {"resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3],
               "resnet50": [3, 4, 6, 3]}


def convert_state_dict(sd, model_name):
    """torchvision ResNet state_dict ({key: np.ndarray}) -> flat flax
    layout dict. Raises KeyError naming the first missing source key, so
    a wrong-architecture checkpoint fails loudly, not silently."""
    if "conv1.weight" not in sd:
        raise KeyError(
            "state_dict has no 'conv1.weight' — not a torchvision ResNet "
            f"layout (keys start with {sorted(sd)[:3]}...)")
    out = {}

    def conv(src, dst):
        if src not in sd:
            raise KeyError(f"missing conv weight {src!r} — checkpoint does "
                           f"not match {model_name}")
        out[f"params/{dst}/kernel"] = np.transpose(sd[src], (2, 3, 1, 0))

    def bn(src, dst):
        for t, flax_name, coll in ((".weight", "scale", "params"),
                                   (".bias", "bias", "params"),
                                   (".running_mean", "mean", "batch_stats"),
                                   (".running_var", "var", "batch_stats")):
            if src + t not in sd:
                raise KeyError(f"missing BN tensor {src + t!r} — checkpoint "
                               f"does not match {model_name}")
            out[f"{coll}/{dst}/{flax_name}"] = sd[src + t]

    conv("conv1.weight", "conv_init")
    bn("bn1", "bn_init")

    is_bottleneck = any(k.startswith("layer1.0.conv3") for k in sd)
    if is_bottleneck != (model_name == "resnet50"):
        raise KeyError(f"checkpoint block type (bottleneck={is_bottleneck}) "
                       f"does not match {model_name}")
    n_convs = 3 if is_bottleneck else 2

    for i, blocks in enumerate(STAGE_SIZES[model_name]):
        for j in range(blocks):
            src = f"layer{i + 1}.{j}"
            dst = f"layer{i + 1}_{j}"
            for c in range(n_convs):
                conv(f"{src}.conv{c + 1}.weight", f"{dst}/Conv_{c}")
                bn(f"{src}.bn{c + 1}", f"{dst}/BatchNorm_{c}")
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{src}.downsample.0.weight", f"{dst}/downsample_conv")
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")
    return out


def convert(model_name, out_path, state_dict=None):
    import torch
    if state_dict is not None:
        ckpt = torch.load(state_dict, map_location="cpu",
                          weights_only=True)
        if "state_dict" in ckpt and not hasattr(ckpt["state_dict"], "dim"):
            ckpt = ckpt["state_dict"]  # lightning-style wrapper
        sd = {k: np.asarray(v) for k, v in ckpt.items()
              if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
    else:
        import torchvision
        tv = getattr(torchvision.models, model_name)(weights="IMAGENET1K_V1")
        sd = {k: v.numpy() for k, v in tv.state_dict().items()}

    out = convert_state_dict(sd, model_name)
    np.savez(out_path, **out)
    print(f"wrote {len(out)} arrays -> {out_path}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="resnet18",
                    choices=sorted(STAGE_SIZES))
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--state_dict", default=None,
                    help="torch .pth checkpoint in torchvision ResNet "
                         "layout (skips the torchvision import)")
    args = ap.parse_args()
    convert(args.model, args.out or f"weights/{args.model}.npz",
            state_dict=args.state_dict)
