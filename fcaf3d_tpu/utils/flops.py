"""Trace-time analytic FLOP accounting for Pallas kernels.

XLA's `compiled.cost_analysis()` attributes ZERO flops to custom calls, so
a cost-analysis-only MFU undercounts every Pallas op (the fused gather-GEMM
carries most of the model's MACs). All kernel shapes are static, so each
wrapper can record its analytic FLOPs *while being traced*: wrap the
`.lower()` call in `flop_counter()` and add the counter's totals to the
cost-analysis number.

Two totals are kept:
- `model`: algorithmic FLOPs (the dense-equivalent GEMM work a reference
  implementation would do) — the numerator of MFU proper.
- `mxu`: MXU ops actually issued, including the one-hot select matmuls the
  windowed kernel spends to avoid row gathers — hardware utilization. The
  search kernel's compare-reduction dots walk data-dependent key ranges and
  are excluded (documented underestimate of a few percent).
"""
from __future__ import annotations

_ACTIVE: list = []


class flop_counter:
    """Context manager accumulating FLOPs recorded during jax tracing.

    Usage:
        with flop_counter() as fc:
            lowered = jax.jit(fn).lower(*args)
        flops = xla_cost_flops + fc.model   # MFU numerator
        mxu_flops = xla_cost_flops + fc.mxu # hardware-work numerator
    """

    def __init__(self):
        self.model = 0.0
        self.mxu = 0.0

    def __enter__(self):
        _ACTIVE.append(self)
        return self

    def __exit__(self, *exc):
        _ACTIVE.remove(self)
        return False


def record_flops(model: float, mxu: float = None) -> None:
    """Add FLOPs to every active counter (no-op when none are active)."""
    if not _ACTIVE:
        return
    if mxu is None:
        mxu = model
    for c in _ACTIVE:
        c.model += model
        c.mxu += mxu
