"""MFU accounting helper for the Pallas kernel benchmarks (VERDICT r2 #4).

`report(rate, useful_flops_per_unit, issued_factor)` turns a measured
unit rate (iterations/s, syntheses/s, passes/s) into useful TFLOP/s and
%-of-peak for the current device. "Useful" counts only the FLOPs the
*algorithm* requires (the mathematical matmuls at their true sizes);
`issued_factor` scales to what the kernel actually issues (e.g. 3 for
bf16x3 multi-pass products); lane padding to the 128-wide MXU tiling is
reported separately via `pad_factor`.
"""

from __future__ import annotations

_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def peak_bf16():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_BF16.items():
        if kind.lower().startswith(k.lower()):
            return v, kind
    return None, kind


def lane_pad(n: int, lane: int = 128) -> float:
    """Padding factor of one operand dimension onto the MXU lane width."""
    return (lane * -(-n // lane)) / n


def report(rate: float, useful_flops_per_unit: float,
           issued_factor: float = 1.0, pad_factor: float = 1.0) -> str:
    useful = rate * useful_flops_per_unit
    peak, kind = peak_bf16()
    line = f"useful {useful / 1e12:.2f} TFLOP/s"
    if issued_factor != 1.0:
        line += f", issued {useful * issued_factor / 1e12:.2f}"
    if peak:
        line += (f"; MFU {useful / peak:.1%} useful / "
                 f"{useful * issued_factor / peak:.1%} issued")
        if pad_factor != 1.0:
            line += (f" / {useful * issued_factor * pad_factor / peak:.1%}"
                     " incl. lane padding")
        line += f" of {kind} bf16 peak"
    else:
        line += f" (no peak table entry for {kind!r})"
    return line
