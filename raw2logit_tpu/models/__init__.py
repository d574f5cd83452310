"""Task models: ResNet classifiers and U-Net++ segmenters (flax, NHWC)."""

from raw2logit_tpu.models.resnet import ResNet, resnet_model, RESNET_CONFIGS
from raw2logit_tpu.models.unetpp import UNetPlusPlus

__all__ = ["ResNet", "resnet_model", "RESNET_CONFIGS", "UNetPlusPlus"]
