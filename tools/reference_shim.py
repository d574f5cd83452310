"""Import the LITERAL reference pipeline_torch with absent deps stubbed.

The upstream reference (/root/reference, read-only) targets an older
environment: numpy<2 (``numpy.lib.function_base``), skimage, rawpy,
colour_demosaicing, mlflow, b2sdk, segmentation_models_pytorch. None of
those are needed to *run* ``ParametrizedProcessing`` / ``raw2rgb`` /
``RawToRGB`` (pure torch, processing/pipeline_torch.py:43-283), but they
are imported at module scope — directly (pipeline_torch.py:2,11) or via
the module-scope ``from processing.pipeline_numpy import processing``
and ``from utils.base import np2torch, torch2np`` (pipeline_torch.py:8-9),
both of which are only *used* in the ``__main__`` validation block
(pipeline_torch.py:287-347).

This shim registers inert stand-ins for exactly those module names, puts
the reference root on ``sys.path``, and imports
``processing.pipeline_torch`` LITERALLY — zero reference code is modified
or re-implemented here, and every stubbed symbol raises loudly if it is
ever actually called. Used by:

  * tools/gen_reference_fixtures.py — differential parity fixtures
    (VERDICT r3 item 1: per-stage forward + gradients vs the actual
    reference, not vs our own goldens);
  * benchmarks/torch_baseline.py — the reference-anchored CPU baseline
    (VERDICT r3 item 2).

Run this in a dedicated process: putting /root/reference on sys.path
shadows any same-named top-level modules (``utils``, ``dataset``, ...).
"""

import importlib
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _unavailable(qualname):
    def _raise(*args, **kwargs):
        raise ModuleNotFoundError(
            f"{qualname} is a stub installed by tools/reference_shim.py "
            "(the real package is not in this image); the reference code "
            "path you called needs it for real.")
    return _raise


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__doc__ = ("Inert stand-in installed by tools/reference_shim.py; "
                   "see its module docstring.")
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference_pipeline_torch(reference_root=REFERENCE_ROOT):
    """Return the literal ``processing.pipeline_torch`` module object."""
    import numpy as np

    # numpy 2.x removed numpy.lib.function_base (pipeline_torch.py:2
    # imports `interp` from it and never uses it).
    if "numpy.lib.function_base" not in sys.modules:
        _stub_module("numpy.lib.function_base", interp=np.interp)

    # processing.pipeline_numpy drags in rawpy/skimage/colour_demosaicing;
    # pipeline_torch only uses its `processing` in __main__ (:300,319).
    _stub_module("processing.pipeline_numpy",
                 processing=_unavailable("processing.pipeline_numpy.processing"))

    # utils.base drags in mlflow/b2sdk; np2torch/torch2np are __main__-only.
    utils_pkg = _stub_module("utils")
    utils_pkg.__path__ = []  # mark as package so `utils.base` resolves
    _stub_module("utils.base",
                 np2torch=_unavailable("utils.base.np2torch"),
                 torch2np=_unavailable("utils.base.torch2np"))

    # smp is only touched by NNProcessing.__init__ (pipeline_torch.py:97).
    _stub_module("segmentation_models_pytorch",
                 UnetPlusPlus=_unavailable(
                     "segmentation_models_pytorch.UnetPlusPlus"))

    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)

    # pipeline_torch.py:5-6 chdirs to '..' unless cwd holds a README.md —
    # pin cwd to the reference root for the import, then restore.
    cwd = os.getcwd()
    try:
        os.chdir(reference_root)
        return importlib.import_module("processing.pipeline_torch")
    finally:
        os.chdir(cwd)


# Published camera parameters, transcribed from the reference dataset
# registry so shim users never import the reference dataset module
# (it needs tifffile/rawpy): microscopy /root/reference/dataset.py:291-296,
# drone /root/reference/dataset.py:209-213.
MICROSCOPY_CAMERA_PARAMS = (
    [9.834368023181512e-06] * 4,
    [-0.6567, 1.9673, 3.5304],
    [-2.0338, 0.0933, 0.4157, -0.0286, 2.6464, -0.0574,
     -0.5516, -0.0947, 2.9308],
)
DRONE_CAMERA_PARAMS = (
    [0.0625, 0.0626, 0.0625, 0.0626],
    [2.86653646, 1.0, 1.73079425],
    [1.50768983, -0.33571374, -0.17197604, -0.23048614,
     1.70698738, -0.47650126, -0.03119153, -0.32803956, 1.35923111],
)


if __name__ == "__main__":
    pt = load_reference_pipeline_torch()
    import torch
    proc = pt.ParametrizedProcessing(MICROSCOPY_CAMERA_PARAMS,
                                     track_stages=True)
    out = proc(torch.rand(2, 128, 128))
    print("reference ParametrizedProcessing forward:", tuple(out.shape),
          "stages:", list(proc.stages))
