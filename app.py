"""Web demo of the static raw->RGB pipeline (reference app.py:13-54).

Gradio is not installed in this image; the app is gated — when gradio is
available it serves the same interface (upload raw tiff/png, pick camera
parameters + debayer/sharpen/denoise, see the processed RGB), and without it
``process_file`` works as a plain function/CLI.
"""

import sys

import numpy as np

from raw2logit_tpu.data.datasets import (DRONE_CAMERA_PARAMS,
                                         MICROSCOPY_CAMERA_PARAMS)
from raw2logit_tpu.isp import StaticPipeline

CAMERAS = {"Microscope": MICROSCOPY_CAMERA_PARAMS,
           "Drone": DRONE_CAMERA_PARAMS}


def process(raw, camera="Microscope", debayer="bilinear",
            sharpening="sharpening_filter", denoising="gaussian_denoising"):
    """raw (H, W) float in [0, 1] -> RGB (H, W, 3) float in [0, 1]."""
    import jax.numpy as jnp
    pipe = StaticPipeline(camera_parameters=CAMERAS[camera],
                          debayer=debayer, sharpening=sharpening,
                          denoising=denoising)
    return np.asarray(pipe(jnp.asarray(raw, jnp.float32)))


def process_file(path, **kw):
    from PIL import Image
    img = np.asarray(Image.open(path))
    if img.ndim == 3:
        # RGB/RGBA upload: take the first channel as the mosaic plane
        # (reference app.py uses raw_img[:, :, 0])
        img = img[:, :, 0]
    # normalize by the actual bit depth, not a blanket 2^16-1 (an 8-bit
    # upload divided by 65535 renders near-black)
    if img.dtype == np.uint8:
        raw = img.astype(np.float32) / 255.0
    elif img.dtype.kind in "ui":
        raw = img.astype(np.float32) / (2 ** 16 - 1)
    else:
        raw = img.astype(np.float32)
        if raw.max() > 1:
            raw = raw / (2 ** 16 - 1)
    return process(raw, **kw)


def launch():
    try:
        import gradio as gr
    except ImportError:
        print("gradio not installed; use process_file(path) instead")
        return None
    demo = gr.Interface(
        # gradio 3.x hands a tempfile-like object, 4.x a filepath str
        fn=lambda f, cam, db, sh, dn: process_file(
            f if isinstance(f, str) else f.name, camera=cam,
            debayer=db, sharpening=sh, denoising=dn),
        inputs=[gr.File(label="RawImage"),
                gr.Dropdown(list(CAMERAS), value="Microscope",
                            label="CameraParameters"),
                gr.Dropdown(["bilinear", "malvar2004", "menon2007"],
                            value="bilinear", label="Debayer"),
                gr.Dropdown(["sharpening_filter", "unsharp_masking"],
                            value="sharpening_filter", label="Sharpening"),
                gr.Dropdown(["gaussian_denoising", "median_denoising",
                             "fft_denoising"], value="gaussian_denoising",
                            label="Denoising")],
        outputs=gr.Image(label="Processed RGB"),
        title="raw2logit_tpu static ISP demo")
    demo.launch()
    return demo


if __name__ == "__main__":
    if len(sys.argv) > 1:
        rgb = process_file(sys.argv[1])
        out = sys.argv[1].rsplit(".", 1)[0] + "_rgb.png"
        from PIL import Image
        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(out)
        print(f"wrote {out}")
    else:
        launch()
