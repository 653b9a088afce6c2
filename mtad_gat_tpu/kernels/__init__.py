from mtad_gat_tpu.kernels.gat_pallas import gatv2_attention_fused

__all__ = ["gatv2_attention_fused"]
