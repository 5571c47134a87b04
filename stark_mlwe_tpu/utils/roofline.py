"""Roofline accounting for the hot kernels.

The reference's perf surface is criterion timings
(/root/reference/crates/*/benches); on TPU the useful extra signal is
how far each kernel sits from the hardware ceilings.  This module holds
the exact algebraic work models (derived from the spec parameters, not
estimated) and v5e peak numbers, and turns measured throughputs into
achieved-rates + peak fractions.  `bench_micro.py` emits these next to
the raw timings.
"""

from __future__ import annotations

from ..spec.poseidon import PoseidonParams

# Single v5e chip ceilings (public TPU v5e specs).
V5E_BF16_FLOPS = 197e12
V5E_INT8_OPS = 394e12
V5E_HBM_BYTES_PER_S = 819e9
V5E_CLOCK_HZ = 0.94e9


def poseidon_field_muls(params: PoseidonParams) -> int:
    """Exact modular multiply count of ONE reference permutation
    (poseidon/src/lib.rs:31-68): per full round, t S-box x^5 (3 muls
    each) + the dense t x t MDS; per partial round, one S-box + the
    dense MDS (the factorized/affine evaluations do strictly less work;
    this is the algorithmic count the throughput is measured against)."""
    t = params.t
    full = params.rf * (3 * t + t * t)
    part = params.rp * (3 + t * t)
    return full + part


def poseidon_rates(params: PoseidonParams, perms_per_s: float) -> dict:
    """Achieved rates for a measured permutation throughput."""
    muls = poseidon_field_muls(params)
    field_muls_per_s = perms_per_s * muls
    # One 255-bit Montgomery multiply in the 16x16-bit limb scheme is
    # 256 16x16->32 partial products + 256 REDC partial products.
    int_macs_per_s = field_muls_per_s * 512
    state_bytes = params.t * 16 * 4 * 2  # read + write
    return {
        "field_muls_per_perm": muls,
        "field_muls_per_s": field_muls_per_s,
        "equiv_int16_macs_per_s": int_macs_per_s,
        "hbm_fraction": perms_per_s * state_bytes / V5E_HBM_BYTES_PER_S,
    }


def ntt_rates(n: int, seconds: float) -> dict:
    """Radix-2 NTT: (n/2) log2 n butterfly multiplies."""
    import math

    muls = (n // 2) * int(math.log2(n))
    return {
        "field_muls_per_s": muls / seconds,
        "equiv_int16_macs_per_s": muls * 512 / seconds,
        "hbm_fraction": (n * 64 * 2 * int(math.log2(n))
                         / seconds / V5E_HBM_BYTES_PER_S),
    }
