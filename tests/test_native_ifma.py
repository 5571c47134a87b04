"""Bit-exactness tests for the AVX-512 IFMA native engine
(native/poseidon_ifma.cpp) against the pure-Python golden model.

The engine is an alternate backend of the same scalar-kernel API
(native.permute_ints_batch / hash_ds_dynamic_rows / absorb_chains), so
these tests also re-verify the routing layer.  Skipped wholesale on
hosts without AVX-512 IFMA (the scalar kernel remains covered by the
existing suites).
"""

import random

import numpy as np
import pytest

from stark_mlwe_tpu import native
from stark_mlwe_tpu.spec.field import P
from stark_mlwe_tpu.spec.poseidon import (hash_with_ds_dynamic,
                                          params_for_width)
from stark_mlwe_tpu.spec.poseidon import permute as spec_permute

pytestmark = pytest.mark.skipif(not native.ifma_available(),
                                reason="AVX-512 IFMA not available")

WIDTHS = [9, 17, 33, 65, 129]


def _rng(seed):
    r = random.Random(seed)
    return r


@pytest.mark.parametrize("t", WIDTHS)
def test_permute_bit_exact(t):
    r = _rng(100 + t)
    params = params_for_width(t)
    # 13 states: one full 8-lane group plus a 5-lane tail (masked scatter)
    states = [[r.randrange(P) for _ in range(t)] for _ in range(13)]
    got = native.permute_ints_batch([list(s) for s in states], params)
    want = [spec_permute(list(s), params) for s in states]
    assert got == want


@pytest.mark.parametrize("t", [17, 33, 65, 129])
def test_hash_ds_rows_bit_exact(t):
    r = _rng(200 + t)
    params = params_for_width(t)
    # nfields = t + 3 forces a second rate block and mid-block padding
    nfields = t + 3
    rows = [[r.randrange(P) for _ in range(nfields)] for _ in range(11)]
    got = native.hash_ds_dynamic_rows(rows, params)
    want = [hash_with_ds_dynamic(row[:4], row[4:], params) for row in rows]
    assert got == want


def test_hash_rows_exact_block_boundary():
    """nfields + 1 (the 10* pad marker) landing exactly on a rate
    boundary exercises the trailing-permute path."""
    params = params_for_width(17)
    r = _rng(7)
    rate = 16
    for nfields in (rate - 1, rate, 2 * rate - 1):
        rows = [[r.randrange(P) for _ in range(nfields)] for _ in range(3)]
        got = native.hash_ds_dynamic_rows(rows, params)
        want = [hash_with_ds_dynamic(row[:4], row[4:], params)
                for row in rows]
        assert got == want, nfields


def test_absorb_chains_matches_scalar():
    """IFMA lane-parallel chains == scalar chain kernel (which is itself
    tested against the golden transcript)."""
    params = params_for_width(17)
    r = _rng(31)
    t, C, n = 17, 4, 67
    states = [[r.randrange(P) for _ in range(t)] for _ in range(C)]
    poss = [3] * C
    R = (1 << 256) % P
    cols = np.zeros((C, n, 4), np.uint64)
    for c in range(C):
        for i in range(n):
            v = r.randrange(P) * R % P
            for j in range(4):
                cols[c, i, j] = (v >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
    got = native.absorb_chains([list(s) for s in states], list(poss),
                               cols, params)
    saved = (native._ifma_lib, native._ifma_failed)
    try:
        native._ifma_lib, native._ifma_failed = None, True
        want = native.absorb_chains([list(s) for s in states], list(poss),
                                    cols, params)
    finally:
        native._ifma_lib, native._ifma_failed = saved
    assert got[0] == want[0]
    assert got[1] == want[1]


def test_relaxed_accumulation_extremes():
    """Feed states of all-(P-1) and tiny values: exercises the
    conditional-subtract-2P path and the boundary canonicalization."""
    params = params_for_width(17)
    states = [[P - 1] * 17, [0] * 17, [1] * 17,
              [P - 1 if i % 2 else 0 for i in range(17)]]
    got = native.permute_ints_batch([list(s) for s in states], params)
    want = [spec_permute(list(s), params) for s in states]
    assert got == want
    for st in got:
        assert all(0 <= v < P for v in st)


def test_phi_batch_u16_matches_oracle():
    """Host fr_phi_batch (a*s + e - t, Montgomery 4x64) vs the Python
    oracle, through the uint16 half-width upload packing."""
    import random

    import numpy as np

    from stark_mlwe_tpu import native
    from stark_mlwe_tpu.ops import fr
    from stark_mlwe_tpu.spec.field import P

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = random.Random(0xF00D)
    n = 513  # odd: no alignment assumptions
    cols = [[rng.randrange(P) for _ in range(n)] for _ in range(4)]
    packed = [fr.pack_ints(c, mont=True) for c in cols]
    phi16 = native.phi_batch_u16([native.u32limbs_to_u64(p)
                                  for p in packed])
    got = fr.unpack_ints(phi16.astype(np.uint32), mont=True)
    want = [(a * s + e - t) % P for a, s, e, t in zip(*cols)]
    assert got == want
