"""Spatial (SP) sharding: full-frame ISP with rows sharded across the mesh
must match the unsharded result exactly (XLA SPMD inserts the stencil halo
exchanges; parallel/spatial.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raw2logit_tpu.data.datasets import DRONE_CAMERA_PARAMS
from raw2logit_tpu.isp import ParametrizedProcessing, StaticPipeline
from raw2logit_tpu.parallel import (make_mesh, process_full_frames,
                                    spatial_sharding)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    # full frames: taller than wide to make the row split meaningful
    return jnp.asarray(rng.uniform(0.05, 0.95, size=(2, 256, 128)),
                       jnp.float32)


@pytest.mark.parametrize("denoising", ["gaussian_denoising",
                                       "median_denoising"])
def test_static_full_frame_sharded_matches_unsharded(frames, denoising):
    n = min(8, jax.device_count())
    mesh = make_mesh(n)
    pipe = StaticPipeline(camera_parameters=DRONE_CAMERA_PARAMS,
                          debayer="malvar2004",
                          sharpening="sharpening_filter",
                          denoising=denoising)
    want = jax.jit(lambda r: pipe(r))(frames)
    got = process_full_frames(pipe, mesh, frames)
    assert got.sharding.is_equivalent_to(spatial_sharding(mesh),
                                         got.ndim)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_parametrized_full_frame_sharded_matches(frames):
    n = min(8, jax.device_count())
    mesh = make_mesh(n)
    proc = ParametrizedProcessing(camera_parameters=DRONE_CAMERA_PARAMS,
                                  image_size=None, batch_norm_output=False)
    variables = proc.init(jax.random.key(0), frames, train=False)

    def fn(raw):
        return proc.apply(variables, raw, train=False)[0]

    want = jax.jit(fn)(frames)
    got = process_full_frames(fn, mesh, frames)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_fft_denoise_global_op_still_correct(frames):
    """fft_denoising transforms the (W, C) axes (the reference's fftpack
    quirk), so it is row-LOCAL under row sharding and must match the
    unsharded result exactly. fft_denoise uses a 1-D fft decomposition
    precisely so this compiles on XLA:CPU under SPMD (the multi-dim fft
    thunk RET_CHECKs on partitioner-produced layouts, fft_thunk.cc:167)."""
    n = min(8, jax.device_count())
    mesh = make_mesh(n)
    pipe = StaticPipeline(camera_parameters=DRONE_CAMERA_PARAMS,
                          debayer="bilinear",
                          sharpening="unsharp_masking",
                          denoising="fft_denoising")
    want = jax.jit(lambda r: pipe(r))(frames)
    got = process_full_frames(pipe, mesh, frames)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)
