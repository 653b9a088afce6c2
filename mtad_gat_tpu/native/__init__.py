from mtad_gat_tpu.native.host_ops import (
    native_available,
    csv_load_f32,
    point_adjust_native,
    bf_search_native,
)

__all__ = [
    "native_available",
    "csv_load_f32",
    "point_adjust_native",
    "bf_search_native",
]
