from mtad_gat_tpu.models.mtad_gat import MTADGAT

__all__ = ["MTADGAT"]
