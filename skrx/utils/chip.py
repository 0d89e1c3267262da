"""Chip peak numbers shared by the roofline script and the bench artifact.

(bf16 matmul FLOP/s, f32 matmul FLOP/s, HBM bytes/s) per device kind;
unknown kinds fall back to v5e. Used to turn measured wall times into
achieved GB/s and %-of-roofline so the bench JSON self-certifies
efficiency (VERDICT r4 #6) with the same accounting as
scripts/roofline.py.
"""
__all__ = ["PEAKS", "chip_peaks"]

PEAKS = {
    "TPU v5 lite": (197e12, 98.5e12, 819e9),
    "TPU v5e": (197e12, 98.5e12, 819e9),
    "TPU v4": (275e12, 137.5e12, 1229e9),
    "TPU v6 lite": (918e12, 459e12, 1640e9),
}


def chip_peaks():
    """(device_kind, (bf16 FLOP/s, f32 FLOP/s, HBM bytes/s)) of device 0."""
    import jax
    kind = jax.devices()[0].device_kind
    return kind, PEAKS.get(kind, PEAKS["TPU v5 lite"])
