"""PyTorch CPU baseline for bench.py.

The reference publishes no perf numbers (BASELINE.md), so the baseline is
MEASURED: a torch implementation of the same raw->logit train step
(parametrized ISP -> ResNet18 -> CE -> Adam) on CPU, the reference's only
non-CUDA execution mode in this image (torch is CPU-only here). Model and
ISP are written independently with the same math/shape structure as the
reference configs (batch geometry from figures/train.sh: 256x256 tiles).
"""

import json
import os
import time

import numpy as np


def _build_torch_models(n_classes=9):
    import torch
    import torch.nn as nn

    class ISP(nn.Module):
        def __init__(self):
            super().__init__()
            self.black_level = nn.Parameter(torch.zeros(4))
            self.white_balance = nn.Parameter(torch.ones(1, 3))
            self.ccm = nn.Parameter(torch.eye(3))
            self.gamma = nn.Parameter(torch.tensor([2.2]))
            self.debayer = nn.Conv2d(3, 3, 3, padding=1,
                                     padding_mode="reflect", bias=False,
                                     groups=3)
            self.sharpen = nn.Conv2d(1, 1, 3, padding=1, bias=False)
            self.blur = nn.Conv2d(1, 1, 5, padding=2,
                                  padding_mode="reflect", bias=False)
            self.bn = nn.BatchNorm2d(3, affine=False)
            m = torch.tensor([[0.299, 0.587, 0.114],
                              [-0.14714119, -0.28886916, 0.43601035],
                              [0.61497538, -0.51496512, -0.10001026]])
            self.register_buffer("rgb2yuv", m)
            self.register_buffer("yuv2rgb", torch.linalg.inv(m))

        def forward(self, raw):
            b, h, w = raw.shape
            rgb = raw.new_zeros((b, 3, h, w))
            rgb[:, 0, 0::2, 0::2] = raw[:, 0::2, 0::2] - self.black_level[0]
            rgb[:, 1, 0::2, 1::2] = raw[:, 0::2, 1::2] - self.black_level[1]
            rgb[:, 1, 1::2, 0::2] = raw[:, 1::2, 0::2] - self.black_level[2]
            rgb[:, 2, 1::2, 1::2] = raw[:, 1::2, 1::2] - self.black_level[3]
            rgb = self.debayer(rgb)
            rgb = rgb * self.white_balance.reshape(1, 3, 1, 1)
            rgb = torch.einsum("bchw,kc->bkhw", rgb, self.ccm)
            yuv = torch.einsum("bchw,kc->bkhw", rgb, self.rgb2yuv)
            yuv = torch.cat([self.sharpen(yuv[:, :1]), yuv[:, 1:]], dim=1)
            yuv = torch.cat([self.blur(yuv[:, :1]), yuv[:, 1:]], dim=1)
            rgb = torch.einsum("bchw,kc->bkhw", yuv, self.yuv2rgb)
            rgb = torch.clip(rgb, 1e-5, 1.0)
            rgb = torch.exp(torch.log(rgb) / self.gamma)
            return self.bn(rgb)

    class Block(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.b1 = nn.BatchNorm2d(cout)
            self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.b2 = nn.BatchNorm2d(cout)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            idn = x if self.down is None else self.down(x)
            y = self.relu(self.b1(self.c1(x)))
            y = self.b2(self.c2(y))
            return self.relu(y + idn)

    class ResNet18(nn.Module):
        def __init__(self, n_classes):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
                nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1))
            layers = []
            cin = 64
            for i, cout in enumerate([64, 128, 256, 512]):
                stride = 1 if i == 0 else 2
                layers += [Block(cin, cout, stride), Block(cout, cout)]
                cin = cout
            self.layers = nn.Sequential(*layers)
            self.fc = nn.Linear(512, n_classes)

        def forward(self, x):
            x = self.layers(self.stem(x))
            return self.fc(x.mean(dim=(2, 3)))

    return ISP(), ResNet18(n_classes)


def measure_torch_cpu(batch=4, image_size=256, steps=3, n_classes=9,
                      train=True):
    """imgs/sec of the joint ISP+ResNet18 step, torch CPU.
    train=True: forward+backward+Adam; train=False: inference forward."""
    import torch
    torch.manual_seed(0)
    isp, net = _build_torch_models(n_classes)
    opt = torch.optim.Adam(list(isp.parameters()) + list(net.parameters()),
                           lr=1e-5)
    loss_fn = torch.nn.CrossEntropyLoss()
    raw = torch.rand(batch, image_size, image_size)
    y = torch.randint(0, n_classes, (batch,))

    if train:
        def one_step():
            opt.zero_grad()
            loss = loss_fn(net(isp(raw)), y)
            loss.backward()
            opt.step()
    else:
        isp.eval()
        net.eval()

        def one_step():
            with torch.no_grad():
                net(isp(raw))

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def get_torch_baseline(cache_path="results/torch_baseline.json", **kw):
    # the cache stores the DEFAULT-config measurement only; a caller
    # asking for a different config must re-measure
    if not kw and os.path.exists(cache_path):
        with open(cache_path) as fh:
            return json.load(fh)["train_imgs_per_sec"]
    val = measure_torch_cpu(**kw)
    if not kw:  # never cache a non-default config under the default key
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "w") as fh:
            json.dump({"train_imgs_per_sec": val,
                       "config": "torch-cpu parametrized ISP + ResNet18, "
                                 "batch 4, 256x256"}, fh)
    return val
