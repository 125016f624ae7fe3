"""Process-global device-FLOP accounting for MFU estimation.

Call sites that dispatch substantial device programs add an analytic FLOP
estimate after each call (the BA solve adds per-LM-iteration costs scaled by
the iteration count the solver actually executed; matching adds the descriptor
matmul; SIFT adds the pyramid convolutions). bench.py divides the accumulated
total by wall time and the device's peak to report an honest model-FLOP
utilization. The models are approximations documented at each call site —
good to ~2x, which is enough to show where we sit relative to the roofline
(incremental SfM is latency- and host-logic-bound, not FLOP-bound).
"""

from __future__ import annotations

import threading


class FlopCounter:
    def __init__(self):
        self._lock = threading.Lock()
        self.total = 0.0
        self.by_tag: dict[str, float] = {}

    def add(self, n: float, tag: str = "other"):
        with self._lock:
            self.total += float(n)
            self.by_tag[tag] = self.by_tag.get(tag, 0.0) + float(n)

    def reset(self):
        with self._lock:
            self.total = 0.0
            self.by_tag.clear()


FLOPS = FlopCounter()


# Peak dense-matmul FLOP/s per chip by TPU generation (bf16 MXU peak; our
# compute is f32 so the achievable ceiling is lower — MFU reported against
# the bf16 number is conservative/honest).
_PEAK_BY_KIND = {
    "TPU v2": 22.5e12,
    "TPU v3": 123.0e12,  # per 2-core chip
    "TPU v4": 137.5e12,
    "TPU v5 lite": 98.5e12,   # v5e: 197 bf16 TFLOP/s per chip (report half for f32 parity)
    "TPU v5e": 98.5e12,
    "TPU v5": 229.5e12,       # v5p: 459 bf16
    "TPU v5p": 229.5e12,
    "TPU v6 lite": 459.0e12,  # trillium: 918 bf16
    "TPU v6e": 459.0e12,
}


def peak_flops_per_s(device) -> float:
    """Best-effort peak for the given jax device; falls back to v5e."""
    kind = getattr(device, "device_kind", "") or ""
    for k, v in _PEAK_BY_KIND.items():
        if kind.startswith(k):
            return v
    return 98.5e12


def ba_solve_flops(n_obs: int, n_pts: int, n_cams: int, n_intr: int,
                   track_len: int, iters: int) -> float:
    """Analytic per-solve FLOP model for ops/ba.solve.

    Per LM iteration:
      residuals+cost (3 evals of ~200 flops/obs), per-obs Jacobians via jacfwd
      (~9 forward passes of ~300 flops), Schur point-block pair tensor
      [P, T, T, 6, 6] contractions (~T^2*432 per point), point-block inverses
      (~200), reduced camera system assembly (C^2*36 accumulate) and dense
      solve ((6C+12K)^3/3), plus back-substitution (~T*120 per point).
    """
    n = float(n_obs)
    per_iter = (
        3 * 200.0 * n
        + 9 * 300.0 * n
        + float(n_pts) * (float(track_len) ** 2 * 432.0 + 200.0 + float(track_len) * 120.0)
        + float(n_cams) ** 2 * 36.0
        + (6.0 * n_cams + 12.0 * n_intr) ** 3 / 3.0
    )
    return per_iter * max(int(iters), 1)
