"""Batched device Poseidon vs the golden spec (bit-exact)."""

import random

import pytest

import jax.numpy as jnp

from stark_mlwe_tpu.ops import fr, poseidon as dpos
from stark_mlwe_tpu.spec import poseidon as spos
from stark_mlwe_tpu.spec.field import P

rng = random.Random(0xBEEF)


def rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]


def to_dev(xs, shape):
    return jnp.asarray(fr.pack_ints(xs, mont=True)).reshape(*shape, fr.N)


@pytest.mark.parametrize("t", [9, 17, 33, 65, 129])
def test_permute_matches_spec(t):
    """All five reference widths (poseidon/src/lib.rs:120-146), including
    t=65 (banded Pallas dense-MXU body) and t=129 (lane-major wide
    kernel, ops/poseidon_wide.py)."""
    params = spos.params_for_width(t)
    dp = dpos.device_params(params)
    B = 3 if t < 65 else 2
    states = [rand_elems(t) for _ in range(B)]
    dev = to_dev([x for s in states for x in s], (B, t))
    out = dpos.permute(dev, dp)
    got = fr.unpack_ints(out.reshape(-1, fr.N), mont=True)
    want = [x for s in states for x in spos.permute(s, params)]
    assert got == want


def test_permute_t17_static_seeds():
    for seed in (b"POSEIDON-T17-X5-SEED", b"POSEIDON-T17-X5-TRANSCRIPT"):
        params = spos.generate_params_t17(seed)
        dp = dpos.device_params(params)
        s = rand_elems(17)
        out = dpos.permute(to_dev(s, (1, 17)), dp)
        got = fr.unpack_ints(out.reshape(-1, fr.N), mont=True)
        assert got == spos.permute(s, params)


@pytest.mark.parametrize("t,k", [(9, 2), (17, 2), (17, 16), (17, 20),
                                 (33, 32), (65, 64), (65, 8),
                                 (129, 128), (129, 8)])
def test_sponge_ds_dynamic(t, k):
    """Sponge at every Merkle arity the reference supports, including the
    full-group (k = t-1) and partial-tail-group shapes of the 64/128-ary
    trees (poseidon/src/lib.rs:288-312 semantics)."""
    params = spos.params_for_width(t)
    dp = dpos.device_params(params)
    B = 2
    ds = [rand_elems(4) for _ in range(B)]
    ins = [rand_elems(k) for _ in range(B)]
    dev_ds = to_dev([x for d in ds for x in d], (B, 4))
    dev_in = to_dev([x for i in ins for x in i], (B, k))
    out = dpos.sponge_hash_ds_dynamic(dev_ds, dev_in, dp)
    got = fr.unpack_ints(out, mont=True)
    want = [spos.hash_with_ds_dynamic(ds[b], ins[b], params) for b in range(B)]
    assert got == want


@pytest.mark.parametrize("k", [1, 2, 15, 16, 17, 33])
def test_sponge_ds_legacy(k):
    params = spos.generate_params_t17(b"POSEIDON-T17-X5-SEED")
    dp = dpos.device_params(params)
    ds_tag = rng.randrange(P)
    B = 2
    ins = [rand_elems(k) for _ in range(B)]
    dev_in = to_dev([x for i in ins for x in i], (B, k))
    tag_m = jnp.asarray(fr.pack_int(ds_tag, mont=True))
    out = dpos.sponge_hash_ds_legacy(dev_in, tag_m, dp)
    got = fr.unpack_ints(out, mont=True)
    want = [spos.hash_with_ds(ins[b], ds_tag, params) for b in range(B)]
    assert got == want


def test_absorb_blocks_matches_manual():
    params = spos.generate_params_t17(b"POSEIDON-T17-X5-TRANSCRIPT")
    dp = dpos.device_params(params)
    rate, t = params.rate, params.t
    nb, B = 3, 2
    fields = [rand_elems(nb * rate) for _ in range(B)]
    # expected: sequential add-block + permute on a zero state
    want = []
    for b in range(B):
        st = [0] * t
        for blk in range(nb):
            for i in range(rate):
                st[i] = (st[i] + fields[b][blk * rate + i]) % P
            st = spos.permute(st, params)
        want.append(st[0])
    blocks = to_dev([x for f in fields for x in f], (B, nb, rate))
    blocks = jnp.moveaxis(blocks, 1, 0)  # [nb, B, rate, 16]
    state = jnp.zeros((B, t, fr.N), dtype=fr.U32)
    out = dpos.absorb_blocks(state, blocks, dp)
    got = fr.unpack_ints(out[:, 0, :], mont=True)
    assert got == want
