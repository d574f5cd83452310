from raw2logit_tpu.evaluation.corruptions import (CORRUPTIONS, distort)
from raw2logit_tpu.evaluation.metrics import ConfusionMetrics

__all__ = ["CORRUPTIONS", "distort", "ConfusionMetrics"]
