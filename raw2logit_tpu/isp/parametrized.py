"""Differentiable, parametrized ISP as a flax module.

TPU-first re-design of the reference ParametrizedProcessing
(processing/pipeline_torch.py:134-225): the whole raw->RGB chain is one
XLA-fusable graph of elementwise ops + tiny stencils, with the processing
parameters (black level, white balance, CCM, gamma, sharpen/blur kernels,
optional additive layer) as learnable flax params. Returns (rgb, stages).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from raw2logit_tpu.ops import constants
from raw2logit_tpu.ops.color import rgb_to_yuv, yuv_to_rgb
from raw2logit_tpu.ops.filters import conv2d_single
from raw2logit_tpu.ops.mosaic import pack_raw
from raw2logit_tpu.isp.batchnorm import TorchBatchNorm


def default_camera_params():
    return constants.DEFAULT_CAMERA_PARAMS


def _debayer_init():
    """(3, 3, cin=3, cout=3) HWIO kernel: K_RB / K_G / K_RB on the diagonal,
    zero cross-channel taps (all trainable, as in the reference)."""
    k = jnp.zeros((3, 3, 3, 3), jnp.float32)
    k = k.at[:, :, 0, 0].set(jnp.asarray(constants.K_RB))
    k = k.at[:, :, 1, 1].set(jnp.asarray(constants.K_G))
    k = k.at[:, :, 2, 2].set(jnp.asarray(constants.K_RB))
    return k


def _debayer_conv(mosaic, k_hwio):
    """3x3 full conv over the scattered mosaic, torch-'reflect' padding."""
    xp = jnp.pad(mosaic, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, k_hwio, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


class ParametrizedProcessing(nn.Module):
    """raw (B, H, W) -> (rgb (B, H, W, 3), stages dict).

    Args:
        camera_parameters: (black_level[4], white_balance[3], colour_matrix[9])
            initial values for the learnable params.
        track_stages: when True, perform the YUV->RGB->YUV round-trip after
            sharpening so the 'sharpening' stage exists in RGB space — this
            matches the reference's numerics-altering behaviour
            (pipeline_torch.py:197-200).
        batch_norm_output: append an affine-free batch norm (torch semantics).
        additive_layer: allocate a learnable zero-initialized (1, H, W, 3)
            additive perturbation (the adversarial 'noise layer',
            pipeline_torch.py:129-131). Requires static image_size.
    """

    camera_parameters: Optional[Tuple] = None
    track_stages: bool = False
    batch_norm_output: bool = True
    additive_layer: bool = False
    image_size: int = 256
    use_pallas: bool = False  # fused-kernel fast path (no stage tracking)

    @nn.compact
    def __call__(self, raw, train: bool = True, taps=None):
        assert raw.ndim == 3, f"needs dims (B, H, W), got {raw.shape}"
        cam = self.camera_parameters or default_camera_params()
        black_level, white_balance, colour_matrix = cam

        bl = self.param("black_level",
                        lambda _: jnp.asarray(black_level, jnp.float32))
        wb = self.param("white_balance",
                        lambda _: jnp.asarray(white_balance, jnp.float32).reshape(1, 3))
        ccm = self.param("colour_correction",
                         lambda _: jnp.asarray(colour_matrix, jnp.float32).reshape(3, 3))
        gamma = self.param("gamma_correct",
                           lambda _: jnp.asarray([2.2], jnp.float32))
        k_sharp = self.param("sharpening_filter",
                             lambda _: jnp.asarray(constants.K_SHARP))
        k_blur = self.param("gaussian_blur",
                            lambda _: jnp.asarray(constants.K_BLUR))
        # the debayer conv weight is itself learnable in the reference
        # (Debayer is an nn.Conv2d, pipeline_torch.py:228-237): full
        # (kh, kw, cin, cout) kernel, initialized to the per-channel
        # bilinear stencils with zero cross-channel taps.
        k_debayer = self.param("debayer", lambda _: _debayer_init())

        stages = {}

        def stage(name, x):
            if taps is not None and name in taps:
                x = x + taps[name]
            stages[name] = x
            return x

        if self.use_pallas and not self.track_stages and taps is None:
            # fused Pallas kernel: one HBM read + one write for the whole
            # pre-batchnorm chain (see pallas/fused_isp.py)
            from raw2logit_tpu.pallas import fused_isp
            rgb = fused_isp(raw, {
                "black_level": bl, "debayer": k_debayer,
                "white_balance": wb, "colour_correction": ccm,
                "sharpening_filter": k_sharp, "gaussian_blur": k_blur,
                "gamma_correct": gamma})
            if self.additive_layer:
                add = self.param(
                    "additive_layer",
                    lambda _: jnp.zeros(
                        (1, self.image_size, self.image_size, 3),
                        jnp.float32))
                rgb = rgb + add
            if self.batch_norm_output:
                rgb = TorchBatchNorm(name="batch_norm")(
                    rgb, use_running_average=not train)
            return rgb, stages

        rgb = pack_raw(raw, black_level=bl, reduce_size=False)
        rgb = stage("demosaic", rgb)

        rgb = _debayer_conv(rgb, k_debayer)

        rgb = rgb * wb.reshape(-1)
        rgb = jnp.einsum("...c,kc->...k", rgb, ccm, precision=jax.lax.Precision.HIGHEST)
        rgb = stage("color_correct", rgb)

        yuv = rgb_to_yuv(rgb)
        y = conv2d_single(yuv[..., 0], k_sharp, pad_mode="zero")
        yuv = yuv.at[..., 0].set(y)

        if self.track_stages:
            # round-trip so the 'sharpening' stage is observable in RGB space
            # (alters numerics exactly like the reference does).
            rgb = yuv_to_rgb(yuv)
            rgb = stage("sharpening", rgb)
            yuv = rgb_to_yuv(rgb)

        y = conv2d_single(yuv[..., 0], k_blur, pad_mode="reflect")
        yuv = yuv.at[..., 0].set(y)
        rgb = yuv_to_rgb(yuv)
        rgb = stage("gaussian", rgb)

        rgb = jnp.clip(rgb, 1e-5, 1.0)
        rgb = stage("clipped", rgb)

        rgb = jnp.exp(jnp.log(rgb) / gamma)
        rgb = stage("gamma_correct", rgb)

        if self.additive_layer:
            add = self.param(
                "additive_layer",
                lambda _: jnp.zeros((1, self.image_size, self.image_size, 3),
                                    jnp.float32))
            rgb = rgb + add
            rgb = stage("noise", rgb)

        if self.batch_norm_output:
            rgb = TorchBatchNorm(name="batch_norm")(
                rgb, use_running_average=not train)

        return rgb, stages
