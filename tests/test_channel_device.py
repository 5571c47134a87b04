"""Device channel/NIZK layer vs golden spec: byte-identical proofs."""

import random

import pytest

from stark_mlwe_tpu import channel as dch
from stark_mlwe_tpu.mle import DeviceMLE
from stark_mlwe_tpu.spec import channel as sch
from stark_mlwe_tpu.spec import mle as smle
from stark_mlwe_tpu.spec.field import P
from stark_mlwe_tpu.spec.transcript import Transcript

rng = random.Random(0xC0C0)


def rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]


def test_fast_transcript_matches_spec():
    t1 = Transcript(b"TEST")
    t2 = dch.FastTranscript(b"TEST")
    data = rand_elems(40)
    t1.absorb_fields(data)
    t2.absorb_fields(data)
    t1.absorb_bytes(b"hello world, this is a longer label")
    t2.absorb_bytes(b"hello world, this is a longer label")
    assert t1.challenge(b"c1") == t2.challenge(b"c1")
    assert t1.challenges(b"c2", 3) == t2.challenges(b"c2", 3)


def test_device_mle_matches_spec():
    k = 6
    vals = rand_elems(1 << k)
    s = smle.MLE(vals)
    d = DeviceMLE.from_ints(vals)
    r = rand_elems(k)
    assert d.eval(r) == s.eval(r)
    assert d.fold_last(r[0]).values() == s.fold_last(r[0]).values
    for var in (0, 2, 5):
        assert d.fold(var, r[1]).values() == s.fold(var, r[1]).values
        for bit in (False, True):
            assert d.fix(var, bit).values() == s.fix(var, bit).values
    assert d.sum() == sum(vals) % P


@pytest.mark.parametrize("k", [5, 7])
def test_prove_plain_matches_spec(k):
    witness = rand_elems(1 << k)
    vk = sch.build_vk_plain(k, ds_tag=77)
    sp = sch.prove_plain(vk, witness)
    dp = dch.prove_plain(vk, witness)
    assert dp.root == sp.root
    assert dp.rounds == sp.rounds
    assert dp.final_eval == sp.final_eval
    assert dch.verify_plain(vk, dp)
    assert sch.verify_plain(vk, dp)
    # tamper
    bad = sch.ProofPlain(dp.root, list(dp.rounds),
                         bytes([dp.final_eval[0] ^ 1]) + dp.final_eval[1:])
    assert not dch.verify_plain(vk, bad)


def test_prove_mf_matches_spec():
    k = 5
    witness = rand_elems(1 << k)
    vk = sch.build_vk_mf(k, ds_tag=123456789, queries_per_round=3)
    sp = sch.prove_mf(vk, witness)
    dp = dch.prove_mf(vk, witness)
    assert dp.initial_root == sp.initial_root
    assert dp.final_eval == sp.final_eval
    assert len(dp.rounds) == len(sp.rounds)
    for r1, r2 in zip(dp.rounds, sp.rounds):
        assert (r1.c0, r1.c1, r1.next_root) == (r2.c0, r2.c1, r2.next_root)
        assert r1.cur_indices == r2.cur_indices
        assert r1.cur_values == r2.cur_values
        assert r1.next_indices == r2.next_indices
        assert r1.next_values == r2.next_values
        assert r1.cur_proof.siblings == r2.cur_proof.siblings
        assert r1.next_proof.siblings == r2.next_proof.siblings
    assert dch.verify_mf(vk, dp)
    assert sch.verify_mf(vk, dp)


def test_mle_channel_roundtrip():
    """MLE commit/eval channel roundtrip in lockstep (channel:1283-1322)."""
    k = 5
    vals = rand_elems(1 << k)
    cfg = sch.MerkleChannelCfg.new(99)
    pc = dch.ProverChannel(dch.FastTranscript(b"MLE/E2E"))
    vc = dch.VerifierChannel(dch.FastTranscript(b"MLE/E2E"))
    mp = dch.MleProver(dch.ChanMerkleProver(pc, cfg), DeviceMLE.from_ints(vals))
    mv = dch.MleVerifier(dch.ChanMerkleVerifier(vc, cfg), k)
    root = mp.commit()
    mv.receive_root(root)
    r_p = mp.draw_point(b"mle/r")
    r_v = mv.draw_point(b"mle/r")
    assert r_p == r_v
    val = mp.evaluate_and_bind(r_p)
    mv.bind_claimed_eval(val)
    vals_open, proof = mp.open_indices([1, 7, 20])
    assert mv.verify_openings([1, 7, 20], vals_open, proof)
    assert val == smle.MLE(vals).eval(r_p)


def test_device_transcript_matches_spec_randomized():
    """DeviceTranscript (transcript_dev.py) vs the golden Transcript over
    randomized interleavings of byte absorbs, constant field absorbs,
    device field absorbs and challenges - stresses permutation boundaries
    at many rate offsets."""
    import jax.numpy as jnp

    from stark_mlwe_tpu.ops import fr
    from stark_mlwe_tpu.transcript_dev import DeviceTranscript

    r = random.Random(0xDE57)
    for trial in range(3):
        label = b"DT/TRIAL" + bytes([trial])
        host = Transcript(label)
        dev = DeviceTranscript(label)
        for _ in range(25):
            op = r.randrange(3)
            if op == 0:
                data = bytes(r.randrange(256) for _ in range(r.randrange(40)))
                host.absorb_bytes(data)
                dev.absorb_bytes(data)
            elif op == 1:
                x = r.randrange(P)
                host.absorb_field(x)
                dev.absorb_field_const(x)
            else:
                x = r.randrange(P)
                host.absorb_field(x)
                dev.absorb_field_dev(jnp.asarray(fr.pack_int(x, mont=True)))
        lab = bytes([trial]) + b"/final"
        want = host.challenge(lab)
        got = fr.unpack_ints(dev.challenge_dev(lab)[None, :], mont=True)[0]
        assert got == want
