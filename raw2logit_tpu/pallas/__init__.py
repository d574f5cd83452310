from raw2logit_tpu.pallas.fused_isp import fused_isp, fused_isp_reference

__all__ = ["fused_isp", "fused_isp_reference"]
