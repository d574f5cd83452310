"""Reference-anchored PyTorch CPU baseline (run as a dedicated process).

The headline ``vs_baseline`` multiplier was previously measured against a
hand-written torch re-implementation of the raw->logit step
(benchmarks/torch_baseline.py). This script anchors the ISP half on the
LITERAL reference implementation instead: tools/reference_shim imports
the unmodified ``/root/reference/processing/pipeline_torch.py`` (stubbing
only its absent third-party deps), and the measured step is

    reference ParametrizedProcessing (pipeline_torch.py:134-228,
    batch_norm_output=True — the parametrized classification config,
    /root/reference/train.py:195-197)
      -> ResNet18 -> CrossEntropyLoss -> Adam(lr=1e-5)
    (/root/reference/train.py:73 lr default, model.py:145 optimizer)

on torch CPU — the reference's own non-CUDA execution mode
(train.py:361-364, gpus=0) and the only torch mode in this image. The
classifier half stays the structurally-matched hand-written ResNet18
from torch_baseline.py because the reference's torchvision import
(/root/reference/model.py:6) is not installable here; the ISP half —
the part this framework re-designs — is the actual reference module.

Must run in its OWN process: the shim puts /root/reference on sys.path,
which shadows top-level module names (utils, model, dataset, ...).
Writes results/torch_baseline_ref.json with train and infer imgs/sec;
bench.py derives its vs_baseline from that file.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

from reference_shim import (MICROSCOPY_CAMERA_PARAMS,  # noqa: E402
                            load_reference_pipeline_torch)
from torch_baseline import _build_torch_models  # noqa: E402


def measure(batch=4, image_size=256, steps=3, n_classes=9):
    import torch
    torch.manual_seed(0)

    pt = load_reference_pipeline_torch()
    isp = pt.ParametrizedProcessing(
        camera_parameters=MICROSCOPY_CAMERA_PARAMS, track_stages=False,
        batch_norm_output=True)
    _, net = _build_torch_models(n_classes)
    opt = torch.optim.Adam(list(isp.parameters()) + list(net.parameters()),
                           lr=1e-5)
    loss_fn = torch.nn.CrossEntropyLoss()
    raw = torch.rand(batch, image_size, image_size)
    y = torch.randint(0, n_classes, (batch,))

    def train_step():
        opt.zero_grad()
        loss = loss_fn(net(isp(raw)), y)
        loss.backward()
        opt.step()

    train_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        train_step()
    train_rate = batch * steps / (time.perf_counter() - t0)

    isp.eval()
    net.eval()

    def infer_step():
        with torch.no_grad():
            net(isp(raw))

    infer_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        infer_step()
    infer_rate = batch * steps / (time.perf_counter() - t0)

    return {
        "train_imgs_per_sec": train_rate,
        "infer_imgs_per_sec": infer_rate,
        "config": ("torch-cpu LITERAL reference ParametrizedProcessing "
                   "(pipeline_torch.py, shimmed unmodified) + hand-written "
                   f"ResNet18, batch {batch}, {image_size}x{image_size}"),
    }


def main():
    out_path = os.environ.get(
        "REF_BASELINE_OUT",
        os.path.join(REPO, "results", "torch_baseline_ref.json"))
    result = measure(
        batch=int(os.environ.get("BENCH_BASELINE_BATCH", 4)),
        image_size=int(os.environ.get("BENCH_BASELINE_SIZE", 256)),
        steps=int(os.environ.get("BENCH_BASELINE_STEPS", 3)))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
