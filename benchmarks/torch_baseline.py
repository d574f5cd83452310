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


def _build_torch_unetpp(n_classes=1, decoder=(256, 128, 64, 32, 16)):
    """torch U-Net++ matching the reference's segmentation config
    (train.py:218-225: smp.UnetPlusPlus, resnet34 encoder, depth 5,
    decoder (256,128,64,32,16), 1 class) or the neural-ISP config
    (depth 3, decoder (256,128,64)). Written independently with the
    same nested-dense-skip structure; smp itself is not in this image."""
    import torch
    import torch.nn as nn

    class Enc34(nn.Module):
        """resnet34-shaped encoder: stem + up to 4 stages (3,4,6,3
        basic blocks); n_stages trims the unused deep stages for
        truncated-depth (neural-ISP) configs."""

        def __init__(self, n_stages=4):
            super().__init__()
            self.n_stages = n_stages

            def block(cin, cout, stride=1):
                layers = [nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
                          nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
                          nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
                          nn.BatchNorm2d(cout)]
                return nn.Sequential(*layers)

            self.conv1 = nn.Sequential(
                nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
                nn.ReLU(inplace=True))
            self.pool = nn.MaxPool2d(3, 2, 1)
            chans = [64, 128, 256, 512][: n_stages]
            reps = [3, 4, 6, 3][: n_stages]
            stages = []
            cin = 64
            for c, r in zip(chans, reps):
                blocks = []
                for j in range(r):
                    stride = 2 if (j == 0 and c != 64) else 1
                    blocks.append(block(cin, c, stride))
                    cin = c
                stages.append(nn.ModuleList(blocks))
            self.stages = nn.ModuleList(stages)
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            feats = [x]
            x = self.conv1(x)
            feats.append(x)  # /2
            x = self.pool(x)
            for stage in self.stages:
                for blk in stage:
                    y = blk(x)
                    if y.shape == x.shape:
                        y = y + x
                    x = self.relu(y)
                feats.append(x)  # /4 /8 /16 /32
            return feats

    class UNetPP(nn.Module):
        """Nested grid X[i][j] over 6 encoder rows (input /1 included),
        head at X[0][depth] — same topology as raw2logit_tpu.models.unetpp
        (which mirrors smp's UnetPlusPlus)."""

        def __init__(self, classes, decoder=(256, 128, 64, 32, 16)):
            super().__init__()
            self.enc = Enc34(n_stages=max(len(decoder) - 1, 1))
            enc_ch = [3, 64, 64, 128, 256, 512]  # rows 0..5, X[i][0]
            row_ch = list(decoder)[::-1]  # row 0 gets decoder[-1]
            self.up = nn.Upsample(scale_factor=2, mode="nearest")
            self.depth = len(decoder)

            def conv(cin, cout):
                return nn.Sequential(
                    nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
                    nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
                    nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
                    nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

            self.blocks = nn.ModuleDict()
            grid_ch = {(i, 0): enc_ch[i] for i in range(self.depth + 1)}
            for j in range(1, self.depth + 1):
                for i in range(self.depth + 1 - j):
                    cin = (sum(grid_ch[(i, k)] for k in range(j))
                           + grid_ch[(i + 1, j - 1)])
                    self.blocks[f"{i}_{j}"] = conv(cin, row_ch[i])
                    grid_ch[(i, j)] = row_ch[i]
            self.head = nn.Conv2d(row_ch[0], classes, 3, 1, 1)

        def forward(self, x):
            import torch
            feats = self.enc(x)  # rows 0..5 at /1 /2 /4 /8 /16 /32
            feats = feats[: self.depth + 1]
            grid = {(i, 0): feats[i] for i in range(self.depth + 1)}
            for j in range(1, self.depth + 1):
                for i in range(self.depth + 1 - j):
                    parts = [grid[(i, k)] for k in range(j)]
                    parts.append(self.up(grid[(i + 1, j - 1)]))
                    grid[(i, j)] = self.blocks[f"{i}_{j}"](
                        torch.cat(parts, dim=1))
            return self.head(grid[(0, self.depth)])

    return UNetPP(n_classes, decoder=decoder)


def measure_torch_cpu_seg(batch=4, image_size=256, steps=2):
    """imgs/sec of the joint ISP + U-Net++ Dice segmentation train step,
    torch CPU (reference train.py:218-237 config)."""
    import torch
    torch.manual_seed(0)
    isp, _ = _build_torch_models()
    net = _build_torch_unetpp(1)
    opt = torch.optim.Adam(list(isp.parameters()) + list(net.parameters()),
                           lr=1e-5)
    raw = torch.rand(batch, image_size, image_size)
    y = torch.randint(0, 2, (batch, 1, image_size, image_size)).float()

    def dice_loss(logits, target, eps=1.0):
        p = torch.sigmoid(logits)
        inter = (p * target).sum()
        return 1 - (2 * inter + eps) / (p.sum() + target.sum() + eps)

    def one_step():
        opt.zero_grad()
        loss = dice_loss(net(isp(raw)), y)
        loss.backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def get_torch_seg_baseline(cache_path="results/torch_baseline_seg.json",
                           **kw):
    if not kw and os.path.exists(cache_path):
        with open(cache_path) as fh:
            return json.load(fh)["train_imgs_per_sec"]
    val = measure_torch_cpu_seg(**kw)
    if not kw:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "w") as fh:
            json.dump({"train_imgs_per_sec": val,
                       "config": "torch-cpu parametrized ISP + U-Net++ "
                                 "(resnet34 enc, depth 5) + Dice, "
                                 "batch 4, 256x256"}, fh)
    return val


def measure_torch_cpu_nn_isp(batch=4, image_size=256, steps=2, n_classes=9):
    """imgs/sec of the neural-ISP train step, torch CPU: half-resolution
    mosaic packing -> U-Net++ (resnet34 enc, depth 3, decoder
    (256,128,64), 3->3) -> BN -> ResNet18 -> CE (reference
    pipeline_torch.py:83-126 + train.py:198-200 config)."""
    import torch
    import torch.nn as nn
    torch.manual_seed(0)
    _, net = _build_torch_models(n_classes)
    isp_unet = _build_torch_unetpp(3, decoder=(256, 128, 64))
    out_bn = nn.BatchNorm2d(3, affine=False)
    opt = torch.optim.Adam(
        list(isp_unet.parameters()) + list(net.parameters()), lr=1e-5)
    loss_fn = torch.nn.CrossEntropyLoss()
    raw = torch.rand(batch, image_size, image_size)
    y = torch.randint(0, n_classes, (batch,))

    def pack(raw):
        # half-size 3-channel packing (reference raw2rgb reduce_size=True)
        r = raw[:, 0::2, 0::2]
        g = (raw[:, 0::2, 1::2] + raw[:, 1::2, 0::2]) / 2
        b = raw[:, 1::2, 1::2]
        return torch.stack([r, g, b], dim=1)

    def one_step():
        opt.zero_grad()
        rgb = out_bn(isp_unet(pack(raw)))
        loss = loss_fn(net(rgb), y)
        loss.backward()
        opt.step()

    one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    return batch * steps / (time.perf_counter() - t0)


def get_torch_nn_isp_baseline(cache_path="results/torch_baseline_nn.json",
                              **kw):
    if not kw and os.path.exists(cache_path):
        with open(cache_path) as fh:
            return json.load(fh)["train_imgs_per_sec"]
    val = measure_torch_cpu_nn_isp(**kw)
    if not kw:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "w") as fh:
            json.dump({"train_imgs_per_sec": val,
                       "config": "torch-cpu neural ISP (U-Net++ d3) + "
                                 "ResNet18, batch 4, 256x256 mosaic"}, fh)
    return val


def _torch_ssim(x, y, window_size=11, sigma=1.5):
    """Differentiable SSIM (11x11 gaussian window, zero 'same' padding,
    grouped conv) — same formulation as the reference's pytorch-ssim
    (utils/ssim.py:19-75) and our ops/ssim.py, written fresh in torch for
    the adversarial CPU baseline."""
    import torch
    import torch.nn.functional as F
    ws = window_size
    g = torch.exp(-((torch.arange(ws, dtype=x.dtype) - ws // 2) ** 2)
                  / (2 * sigma ** 2))
    g = g / g.sum()
    c = x.shape[1]
    w = (g[:, None] @ g[None, :]).expand(c, 1, ws, ws).contiguous()

    def conv(t):
        return F.conv2d(t, w, padding=ws // 2, groups=c)

    mu1, mu2 = conv(x), conv(y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(x * x) - mu1_sq
    s2 = conv(y * y) - mu2_sq
    s12 = conv(x * y) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    num = (2 * mu1_mu2 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    return (num / den).mean()


def measure_torch_cpu_adv(batch=4, image_size=256, steps=3, n_classes=9):
    """imgs/sec of the ADVERSARIAL (drift-forensics) train step, torch
    CPU: maximize task loss over the ISP params with the classifier
    frozen, plus the SSIM aux toward the frozen default processor
    (reference train.py:241-273, weight -1 task loss + 0.3 SSIM)."""
    import copy
    import torch
    torch.manual_seed(0)
    isp, net = _build_torch_models(n_classes)
    ref_isp = copy.deepcopy(isp)
    for p in ref_isp.parameters():
        p.requires_grad_(False)
    for p in net.parameters():  # freeze_classifier
        p.requires_grad_(False)
    opt = torch.optim.Adam(isp.parameters(), lr=1e-3)
    loss_fn = torch.nn.CrossEntropyLoss()
    raw = torch.rand(batch, image_size, image_size)
    y = torch.randint(0, n_classes, (batch,))

    def one_step():
        opt.zero_grad()
        rgb = isp(raw)
        with torch.no_grad():
            ref_rgb = ref_isp(raw)
        loss = -loss_fn(net(rgb), y) + 0.3 * _torch_ssim(ref_rgb, rgb)
        loss.backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    return batch * steps / (time.perf_counter() - t0)


def get_torch_adv_baseline(cache_path="results/torch_baseline_adv.json",
                           **kw):
    if not kw and os.path.exists(cache_path):
        with open(cache_path) as fh:
            return json.load(fh)["train_imgs_per_sec"]
    val = measure_torch_cpu_adv(**kw)
    if not kw:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "w") as fh:
            json.dump({"train_imgs_per_sec": val,
                       "config": "torch-cpu adversarial step (frozen "
                                 "ResNet18, -CE + 0.3*SSIM aux vs frozen "
                                 "default ISP), batch 4, 256x256"}, fh)
    return val


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
