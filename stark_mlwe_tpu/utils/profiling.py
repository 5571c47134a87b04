"""Profiling: JAX profiler traces, phase accounting, device memory stats.

TPU-equivalent of the reference's tracing surface (SURVEY.md section 5:
criterion benches + the `fri_bench_log` eprintln gate + the CSV emitter,
deep_ali/src/fri.rs:12-19, end_to_end.rs:26-78):

  - `trace(logdir)`: captures an XLA profiler trace viewable in
    TensorBoard / Perfetto (per-kernel device timelines — the roofline
    evidence for every fused kernel),
  - `phases`: process-wide accumulator fed by `utils.phase_timer`;
    `phase_report()` returns {phase: {calls, total_s}} and
    `phase_report_csv()` the CSV emission,
  - `device_memory_stats()`: per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
from collections import defaultdict

_phase_acc: dict = defaultdict(lambda: [0, 0.0])
_enabled = True


def record_phase(name: str, seconds: float) -> None:
    if _enabled:
        cell = _phase_acc[name]
        cell[0] += 1
        cell[1] += seconds


def reset_phases() -> None:
    _phase_acc.clear()


def phase_report() -> dict:
    return {k: {"calls": v[0], "total_s": v[1]}
            for k, v in sorted(_phase_acc.items())}


def phase_report_csv() -> str:
    lines = ["phase,calls,total_s"]
    for k, v in sorted(_phase_acc.items()):
        lines.append(f"{k},{v[0]},{v[1]:.6f}")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """XLA profiler trace capture (open in TensorBoard's profile plugin
    or Perfetto).  Usage:

        with profiling.trace("/tmp/stark_trace"):
            prove(...)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list:
    """[{device, bytes_in_use, peak_bytes_in_use, ...}] where supported."""
    import jax

    out = []
    for d in jax.local_devices():
        stats = {}
        try:
            stats = dict(d.memory_stats() or {})
        except Exception:
            pass
        out.append({"device": str(d), **stats})
    return out
