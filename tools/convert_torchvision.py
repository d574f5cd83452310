#!/usr/bin/env python
"""Convert torchvision ResNet ImageNet weights to this framework's flax
layout (weights/<model>.npz), for --classifier_pretrained parity with
model.py:15-23 of the reference.

Run on a host that has torchvision (this image does not):
    python tools/convert_torchvision.py resnet18 weights/resnet18.npz

Layout written (flat dict):
    conv_init/kernel            (7,7,3,64)   HWIO
    bn_init/{scale,bias}        + batch_stats bn_init/{mean,var}
    layer{i}_{j}/<block params> matching models/resnet.py module names
    fc/{kernel,bias}            (512*exp, n) — fc is NOT converted (task
                                head is retrained), written zero-sized.
"""

import sys

import numpy as np


def convert(model_name, out_path):
    import torch
    import torchvision

    tv = getattr(torchvision.models, model_name)(weights="IMAGENET1K_V1")
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    out = {}

    def conv(src, dst):
        out[f"params/{dst}/kernel"] = np.transpose(sd[src], (2, 3, 1, 0))

    def bn(src, dst):
        out[f"params/{dst}/scale"] = sd[f"{src}.weight"]
        out[f"params/{dst}/bias"] = sd[f"{src}.bias"]
        out[f"batch_stats/{dst}/mean"] = sd[f"{src}.running_mean"]
        out[f"batch_stats/{dst}/var"] = sd[f"{src}.running_var"]

    conv("conv1.weight", "conv_init")
    bn("bn1", "bn_init")

    is_bottleneck = any(k.startswith("layer1.0.conv3") for k in sd)
    n_convs = 3 if is_bottleneck else 2
    stage_sizes = {"resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3],
                   "resnet50": [3, 4, 6, 3]}[model_name]

    for i, blocks in enumerate(stage_sizes):
        for j in range(blocks):
            src = f"layer{i + 1}.{j}"
            dst = f"layer{i + 1}_{j}"
            for c in range(n_convs):
                conv(f"{src}.conv{c + 1}.weight", f"{dst}/Conv_{c}")
                bn(f"{src}.bn{c + 1}", f"{dst}/BatchNorm_{c}")
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{src}.downsample.0.weight", f"{dst}/downsample_conv")
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")

    np.savez(out_path, **out)
    print(f"wrote {len(out)} arrays -> {out_path}")


if __name__ == "__main__":
    convert(sys.argv[1] if len(sys.argv) > 1 else "resnet18",
            sys.argv[2] if len(sys.argv) > 2 else "weights/resnet18.npz")
