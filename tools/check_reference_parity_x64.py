#!/usr/bin/env python
"""Float64 exactness check vs the literal reference's gradients.

Loads the f64 fixture section (A64.*, produced by running the unmodified
reference pipeline_torch.py in torch float64 — tools/gen_reference_fixtures.py)
and replays the same forward+backward through our flax pipeline under
JAX_ENABLE_X64. Asserts inf-norm relative error <= 1e-9 on the output,
every processing-parameter gradient, and the input gradient (measured
agreement ~1e-12): the two implementations compute the SAME math, with
the f32 fixture rows covering deployed-precision roundoff behaviour.

Must run in its own process (x64 is a global jax flag):
  env -u PALLAS_AXON_POOL_IPS -u PYTHONPATH JAX_PLATFORMS=cpu \
      JAX_ENABLE_X64=1 python tools/check_reference_parity_x64.py
Driven by tests/test_reference_parity.py::test_float64_exactness.
"""

import json
import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
import jax.numpy as jnp
import numpy as np

TOL = 1e-9


def main():
    assert jax.config.read("jax_enable_x64"), "run with JAX_ENABLE_X64=1"
    from test_reference_parity import (FIXTURE, MICROSCOPY_CAM,
                                       TORCH_PARAM_TO_FLAX, module_for,
                                       nchw_to_nhwc)
    fx = np.load(FIXTURE)

    proc = module_for(MICROSCOPY_CAM, track_stages=True, additive=True,
                      image_size=128)
    params = {fname: jnp.asarray(conv(fx[f"A.param.{tname}"]), jnp.float64)
              for tname, (fname, conv) in TORCH_PARAM_TO_FLAX.items()}
    stats = {"batch_norm": {"mean": jnp.zeros((3,), jnp.float64),
                            "var": jnp.ones((3,), jnp.float64)}}
    raw = jnp.asarray(fx["A.raw"], jnp.float64)
    cot = jnp.asarray(nchw_to_nhwc(fx["A.cot"]), jnp.float64)

    def loss_fn(params, raw):
        (rgb, _), _ = proc.apply({"params": params, "batch_stats": stats},
                                 raw, train=True, mutable=["batch_stats"])
        return jnp.sum(rgb * cot), rgb

    (_, rgb), (pgrads, igrad) = jax.jit(jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True))(params, raw)

    def infrel(got, want):
        return float(np.abs(np.asarray(got) - want).max()
                     / max(np.abs(want).max(), 1e-300))

    report, ok = {}, True
    report["out_train"] = infrel(rgb, nchw_to_nhwc(fx["A64.out_train"]))
    report["input_grad"] = infrel(igrad, fx["A64.input_grad_train"])
    for tname, (fname, conv) in TORCH_PARAM_TO_FLAX.items():
        report[f"grad.{tname}"] = infrel(pgrads[fname],
                                         conv(fx[f"A64.grad_train.{tname}"]))
    for k, v in report.items():
        flag = "" if v <= TOL else "  << ABOVE 1e-9"
        ok = ok and v <= TOL
        print(f"{k:36s} {v:.3e}{flag}")
    print(json.dumps({"x64_parity_ok": ok, "max_infrel": max(report.values())}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
