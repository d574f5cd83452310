"""EP-style pipeline-axis sharding of the drift-synthesis grid
(parallel/pipelines.py): every pipeline variant sharded over the mesh must
match applying each pipeline directly, each device paying only for its own
grid slice."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raw2logit_tpu.data.datasets import MICROSCOPY_CAMERA_PARAMS
from raw2logit_tpu.evaluation.abtesting import pipeline_grid
from raw2logit_tpu.isp import StaticPipeline
from raw2logit_tpu.parallel import make_mesh, process_pipeline_grid


@pytest.fixture(scope="module")
def raw():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0.05, 0.95, size=(2, 32, 32)),
                       jnp.float32)


def _grid_pipes(n=None):
    grid = pipeline_grid()[: n or None]
    return [StaticPipeline(camera_parameters=MICROSCOPY_CAMERA_PARAMS,
                           debayer=db, sharpening=sh, denoising=dn)
            for db, sh, dn in grid]


def test_full_grid_sharded_matches_direct(raw):
    """All 12 grid pipelines (a non-multiple of the 8-device mesh — the
    padded slots must be sliced off) over the full mesh."""
    n = min(8, jax.device_count())
    mesh = make_mesh(n)
    pipes = _grid_pipes()
    got = process_pipeline_grid(pipes, mesh, raw)
    assert got.shape == (len(pipes), raw.shape[0], 3) + raw.shape[1:]
    want = np.stack([np.transpose(np.asarray(jax.jit(lambda r, p=p: p(r))(raw)),
                                  (0, 3, 1, 2)) for p in pipes])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_output_sharded_on_pipeline_axis(raw):
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(n)
    pipes = _grid_pipes(n)  # exactly one pipeline per device
    got = process_pipeline_grid(pipes, mesh, raw)
    from jax.sharding import NamedSharding, PartitionSpec as P
    assert got.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), got.ndim)


def test_switch_stays_conditional_in_hlo(raw):
    """Each device must pay only for its assigned pipelines: the grid
    dispatch has to survive compilation as a real conditional driven by a
    while loop over the LOCAL index slice (a vmap-of-switch formulation
    lowers to computing every branch everywhere and selecting — no
    conditional would remain)."""
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(n)
    pipes = _grid_pipes(n)  # one per device

    from jax.sharding import NamedSharding, PartitionSpec as P
    idx = jax.device_put(jnp.arange(len(pipes), dtype=jnp.int32),
                         NamedSharding(mesh, P("data")))
    r = jax.device_put(raw, NamedSharding(mesh, P()))

    def run(idx, r):
        fn = jax.shard_map(
            lambda li, rr: jax.lax.map(
                lambda i: jnp.transpose(
                    jax.lax.switch(i, [lambda x, p=p: p(x) for p in pipes],
                                   rr),
                    (0, 3, 1, 2)),
                li),
            mesh=mesh, in_specs=(P("data"), P()), out_specs=P("data"))
        return fn(idx, r)

    hlo = jax.jit(run).lower(idx, r).compile().as_text()
    assert "conditional" in hlo    # the switch, not flattened selects
    assert "while" in hlo          # the per-device loop over local indices
