"""Web demo of the static raw->RGB pipeline (reference app.py:13-54).

Gradio is not installed in this image, so the same interface (upload a
raw tiff/png, pick camera parameters + debayer/sharpen/denoise, get the
processed RGB) is served three ways:

  * ``launch()`` — the gradio UI when gradio is importable (API parity
    with the reference's app.py:48-54), falling back to
  * ``serve_http()`` — a dependency-free stdlib http.server UI with the
    identical controls (GET / renders the form, POST /process returns
    the PNG), so the web surface actually serves in this image, and
  * ``process_file`` / CLI — plain function for offline use
    (``python app.py input.png`` writes ``input_rgb.png``;
    ``python app.py --serve [port]`` starts the HTTP UI).
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


_FORM_HTML = """<!doctype html>
<title>raw2logit_tpu static ISP demo</title>
<h1>raw2logit_tpu static ISP demo</h1>
<form action="/process" method="post" enctype="multipart/form-data">
  <p>RawImage: <input type="file" name="file" required></p>
  <p>CameraParameters:
    <select name="camera">{cameras}</select></p>
  <p>Debayer:
    <select name="debayer"><option>bilinear</option>
      <option>malvar2004</option><option>menon2007</option></select></p>
  <p>Sharpening:
    <select name="sharpening"><option>sharpening_filter</option>
      <option>unsharp_masking</option></select></p>
  <p>Denoising:
    <select name="denoising"><option>gaussian_denoising</option>
      <option>median_denoising</option><option>fft_denoising</option>
    </select></p>
  <p><input type="submit" value="Process"></p>
</form>"""


def _parse_multipart(content_type, body):
    """{field: bytes-or-str} from a multipart/form-data body (stdlib email
    parser; the cgi module is deprecated)."""
    import email.parser
    import email.policy
    head = (f"Content-Type: {content_type}\r\nMIME-Version: 1.0\r\n\r\n"
            ).encode()
    msg = email.parser.BytesParser(policy=email.policy.HTTP).parsebytes(
        head + body)
    fields = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name is None:
            continue
        payload = part.get_payload(decode=True)
        if part.get_filename() is None:
            payload = payload.decode("utf-8", "replace").strip()
        fields[name] = payload
    return fields


def make_server(host="127.0.0.1", port=7860):
    """A dependency-free HTTP server with the demo interface. GET /
    renders the form; POST /process runs the static pipeline and returns
    the processed RGB as a PNG."""
    import http.server
    import io
    import tempfile

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, payload):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            cams = "".join(f"<option>{c}</option>" for c in CAMERAS)
            self._send(200, "text/html; charset=utf-8",
                       _FORM_HTML.format(cameras=cams).encode())

        def do_POST(self):
            if self.path != "/process":
                self._send(404, "text/plain", b"not found")
                return
            try:
                length = self.headers["Content-Length"]
                if length is None:
                    self._send(411, "text/plain", b"length required")
                    return
                # Content-Length is client-controlled: reading an
                # arbitrarily large body into memory is a one-request OOM
                if int(length) > 64 * 1024 * 1024:
                    self._send(413, "text/plain", b"payload too large")
                    return
                body = self.rfile.read(int(length))
                fields = _parse_multipart(self.headers["Content-Type"],
                                          body)
                with tempfile.NamedTemporaryFile(suffix=".png") as fh:
                    fh.write(fields["file"])
                    fh.flush()
                    rgb = process_file(
                        fh.name,
                        camera=fields.get("camera", "Microscope"),
                        debayer=fields.get("debayer", "bilinear"),
                        sharpening=fields.get("sharpening",
                                              "sharpening_filter"),
                        denoising=fields.get("denoising",
                                             "gaussian_denoising"))
                from PIL import Image
                buf = io.BytesIO()
                Image.fromarray(
                    (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
                ).save(buf, format="PNG")
                self._send(200, "image/png", buf.getvalue())
            except Exception as e:  # noqa: BLE001 — report to the client
                self._send(400, "text/plain", f"error: {e}".encode())

    return http.server.ThreadingHTTPServer((host, port), Handler)


def serve_http(host="127.0.0.1", port=7860):
    server = make_server(host, port)
    print(f"serving the ISP demo at http://{host}:{server.server_port}/")
    try:
        server.serve_forever()
    finally:
        server.server_close()


def launch():
    try:
        import gradio as gr
    except ImportError:
        print("gradio not installed; serving the stdlib HTTP demo instead "
              "(process_file(path) also works offline)")
        serve_http()
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
    if len(sys.argv) > 1 and sys.argv[1] == "--serve":
        serve_http(port=int(sys.argv[2]) if len(sys.argv) > 2 else 7860)
    elif len(sys.argv) > 1:
        rgb = process_file(sys.argv[1])
        out = sys.argv[1].rsplit(".", 1)[0] + "_rgb.png"
        from PIL import Image
        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(out)
        print(f"wrote {out}")
    else:
        launch()
