"""Top-level MLWE STARK API: prove/verify + wire-format roundtrip."""

from stark_mlwe_tpu.stark import (DeepFriParams, MlweWitness,
                                  deserialize_proof, prove, serialize_proof,
                                  verify)


def test_mlwe_stark_roundtrip():
    w = MlweWitness.random(k=6, seed=2024)
    # satisfying instance: t = a*s + e
    from stark_mlwe_tpu.spec.field import P
    assert all((w.a[i] * w.s[i] + w.e[i]) % P == w.t[i]
               for i in range(len(w.a)))
    params = DeepFriParams(schedule=[8, 4], r=6, seed_z=0xDEEF_BAAD)
    proof = prove(w, params)
    assert verify(params, proof)

    buf = serialize_proof(proof)
    back = deserialize_proof(buf)
    assert serialize_proof(back) == buf
    assert verify(params, back)


def test_blinded_prove():
    import random
    from stark_mlwe_tpu.spec.field import P
    rng = random.Random(5)
    w = MlweWitness.random(k=5, seed=7)
    r_col = [rng.randrange(P) for _ in range(1 << 5)]
    params = DeepFriParams(schedule=[4, 4], r=4, seed_z=99)
    proof = prove(w, params, blinding_r=r_col)
    assert verify(params, proof)
