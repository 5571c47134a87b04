"""Pallas fused Poseidon kernels vs the golden spec (interpret mode).

On CPU the kernels run through the Pallas interpreter - slow, so shapes
are minimal.  On TPU the same code paths are exercised at scale by
bench.py and the e2e proof-equality tests.
"""

import random

import pytest

import jax.numpy as jnp

from stark_mlwe_tpu.ops import fr
from stark_mlwe_tpu.ops import poseidon as dpos
from stark_mlwe_tpu.ops import poseidon_pallas as pp
from stark_mlwe_tpu.spec import poseidon as spos
from stark_mlwe_tpu.spec.field import P

import os

HEAVY = os.environ.get("STARK_TESTS_HEAVY", "0") not in ("", "0")


def rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]

rng = random.Random(0x9A11A5)


def test_pallas_permute_interpret_matches_spec():
    params = spos.params_for_width(17)
    dp = dpos.device_params(params)
    B = 2
    states = [[rng.randrange(P) for _ in range(17)] for _ in range(B)]
    dev = jnp.asarray(fr.pack_ints(
        [x for s in states for x in s], mont=True)).reshape(B, 17, fr.N)
    out = pp.permute(dev, dp, interpret=True)
    got = fr.unpack_ints(out.reshape(-1, fr.N), mont=True)
    want = [x for s in states for x in spos.permute(s, params)]
    assert got == want


def test_pallas_absorb_chain_interpret_matches_spec():
    params = spos.params_for_width(17)
    dp = dpos.device_params(params)
    rate, t = params.rate, params.t
    C, nb = 2, 2
    fields = [[rng.randrange(P) for _ in range(nb * rate)] for _ in range(C)]
    want = []
    for c in range(C):
        st = [0] * t
        for b in range(nb):
            for i in range(rate):
                st[i] = (st[i] + fields[c][b * rate + i]) % P
            st = spos.permute(st, params)
        want.append(st)

    init = jnp.zeros((t, fr.N, C), dtype=fr.U32)
    blocks = jnp.asarray(fr.pack_ints(
        [x for f in fields for x in f], mont=True)).reshape(
            C, nb, rate, fr.N)
    blocks = jnp.moveaxis(blocks, 0, -1)  # [nb, rate, 16, C]
    out = pp.absorb_chain(init, blocks, dp, interpret=True)
    got_states = jnp.moveaxis(out, -1, 0).reshape(C * t, fr.N)
    got = fr.unpack_ints(got_states, mont=True)
    want_flat = [x for st in want for x in st]
    assert got == want_flat


def test_chain_lanes_interpret_matches_spec():
    """Lane-parallel chain kernel (poseidon_chain): 4 chains at 32-lane
    stride, limbs in sublanes — the production FS witness-absorb path."""
    import numpy as np

    from stark_mlwe_tpu.ops import poseidon_chain as pch

    params = spos.params_for_width(17)
    dp = dpos.device_params(params)
    rate, t = params.rate, params.t
    C, nb = 4, 1  # one block: interpret mode pays per-op; 1 permutation
    fields = [[rng.randrange(P) for _ in range(nb * rate)] for _ in range(C)]
    want = []
    for c in range(C):
        st = [0] * t
        for b in range(nb):
            for i in range(rate):
                st[i] = (st[i] + fields[c][b * rate + i]) % P
            st = spos.permute(st, params)
        want.append(st)

    init = jnp.zeros((fr.N, pch.G), dtype=fr.U32)
    blk_np = np.zeros((nb, fr.N, pch.G), dtype=np.uint32)
    for b in range(nb):
        blk_np[b] = pch.pack_lanes(
            [fields[c][b * rate:(b + 1) * rate] for c in range(C)])
    out = pch.absorb_chain_lanes(init, jnp.asarray(blk_np), dp,
                                 interpret=True)
    got = pch.unpack_lanes(out, t, C)
    assert got == want


@pytest.mark.parametrize("t", [65, 129])
def test_wide_permute_device_matches_spec(t):
    """Default-on compiled bit-exactness of the wide kernels behind the
    uni128* presets (t=65/129) — runs whenever the backend is TPU (fast
    there); the interpret-mode variant below stays HEAVY-gated for CPU."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("compiled wide-kernel check needs the TPU backend")
    from stark_mlwe_tpu.ops import poseidon_wide as pw

    params = spos.params_for_width(t)
    dp = dpos.device_params(params)
    s = rand_elems(t)
    dev = jnp.asarray(fr.pack_ints(s, mont=True)).reshape(1, t, fr.N)
    out = pw.permute(dev, dp)
    got = fr.unpack_ints(out.reshape(-1, fr.N), mont=True)
    assert got == spos.permute(s, params)


@pytest.mark.parametrize("t", [
    pytest.param(65, marks=[] if HEAVY else pytest.mark.skip(
        reason="~4 min interpret run (STARK_TESTS_HEAVY=1)")),
    pytest.param(129, marks=[] if HEAVY else pytest.mark.skip(
        reason="~5 min interpret run (STARK_TESTS_HEAVY=1)")),
])
def test_wide_permute_interpret_matches_spec(t):
    """Lane-major wide kernel (ops/poseidon_wide.py) vs spec in interpret
    mode - covers the high-magnitude (~2^30 frame rows) paired-REDC path
    the banded tests never reach.  The TPU driver exercises the same
    route on-device via test_ops_poseidon."""
    from stark_mlwe_tpu.ops import poseidon_wide as pw

    params = spos.params_for_width(t)
    dp = dpos.device_params(params)
    s = rand_elems(t)
    dev = jnp.asarray(fr.pack_ints(s, mont=True)).reshape(1, t, fr.N)
    out = pw.permute(dev, dp, interpret=True)
    got = fr.unpack_ints(out.reshape(-1, fr.N), mont=True)
    assert got == spos.permute(s, params)
