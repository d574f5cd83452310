"""Smoke tests for the measured torch-CPU baselines (benchmarks/).

The baselines exist so every TPU number has a measured reference-
execution-model counterpart (BASELINE.md: the reference publishes no
perf numbers). These tests only check the models build and produce the
right shapes at toy sizes — the actual measurements run offline.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

torch = pytest.importorskip("torch")


def test_torch_unetpp_seg_shapes():
    from benchmarks.torch_baseline import _build_torch_unetpp
    net = _build_torch_unetpp(1)  # reference seg config, depth 5
    x = torch.rand(2, 3, 64, 64)
    out = net(x)
    assert out.shape == (2, 1, 64, 64)


def test_torch_unetpp_depth3_shapes():
    from benchmarks.torch_baseline import _build_torch_unetpp
    net = _build_torch_unetpp(3, decoder=(256, 128, 64))  # neural-ISP cfg
    x = torch.rand(2, 3, 32, 32)
    out = net(x)
    assert out.shape == (2, 3, 32, 32)
    # truncated depth must trim the deep encoder stages (fairness: the
    # baseline should not pay for stages the grid never consumes)
    assert len(net.enc.stages) == 2


def test_torch_isp_resnet_shapes():
    from benchmarks.torch_baseline import _build_torch_models
    isp, net = _build_torch_models(n_classes=5)
    raw = torch.rand(2, 64, 64)
    rgb = isp(raw)
    assert rgb.shape == (2, 3, 64, 64)
    assert net(rgb).shape == (2, 5)
