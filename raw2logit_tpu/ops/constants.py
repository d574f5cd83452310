"""Fixed ISP constants.

All values are standard published constants (ITU-R BT.601 luma/chroma and the
Rec.601 YUV transform as used by skimage.color, and textbook bilinear CFA
interpolation stencils). The reference hardcodes the same numbers at
processing/pipeline_torch.py:13-40; we derive what can be derived and cite
the published source for the rest.
"""

import numpy as np

# Bilinear CFA interpolation stencils (textbook; reference
# processing/pipeline_torch.py:13-19). Applied to a sparse mosaic where 3/4
# (R/B) or 1/2 (G) of sites are zero, these reconstruct the missing sites by
# neighbour averaging and pass known sites through unchanged.
K_G = np.array([[0.0, 1.0, 0.0],
                [1.0, 4.0, 1.0],
                [0.0, 1.0, 0.0]], dtype=np.float32) / 4.0

K_RB = np.array([[1.0, 2.0, 1.0],
                 [2.0, 4.0, 2.0],
                 [1.0, 2.0, 1.0]], dtype=np.float32) / 4.0

# Rec.601 RGB->YUV as used by skimage.color.rgb2yuv (the reference uses both
# the skimage function, processing/pipeline_numpy.py:14, and a hardcoded copy,
# processing/pipeline_torch.py:21-26). YUV->RGB is the exact inverse.
M_RGB_2_YUV = np.array(
    [[0.299, 0.587, 0.114],
     [-0.14714119, -0.28886916, 0.43601035],
     [0.61497538, -0.51496512, -0.10001026]], dtype=np.float64)
M_YUV_2_RGB = np.linalg.inv(M_RGB_2_YUV)

M_RGB_2_YUV = M_RGB_2_YUV.astype(np.float32)
M_YUV_2_RGB = M_YUV_2_RGB.astype(np.float32)

# Fixed 3x3 sharpening stencil (identity + discrete Laplacian; reference
# processing/pipeline_torch.py:33-35 and pipeline_numpy.py:180).
K_SHARP = np.array([[0.0, -1.0, 0.0],
                    [-1.0, 5.0, -1.0],
                    [0.0, -1.0, 0.0]], dtype=np.float32)


def _gaussian_1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


# 5x5 separable Gaussian, sigma=0.5, truncated at radius 2 — exactly
# scipy.ndimage.gaussian_filter(sigma=0.5) which the static pipeline uses
# (pipeline_numpy.py:206). The reference's hardcoded K_BLUR
# (pipeline_torch.py:28-32) is this same kernel rounded to 5 significant
# digits; we use the exact values.
G_BLUR_1D = _gaussian_1d(0.5, 2)
K_BLUR = np.outer(G_BLUR_1D, G_BLUR_1D).astype(np.float32)

# Default camera parameters: no black level, unit white balance, identity CCM
# (reference processing/pipeline_torch.py:36-40).
DEFAULT_CAMERA_PARAMS = (
    [0.0, 0.0, 0.0, 0.0],
    [1.0, 1.0, 1.0],
    [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0],
)
