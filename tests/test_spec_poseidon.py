"""Spec-model Poseidon + transcript tests (mirror reference unit tests)."""

from stark_mlwe_tpu.spec import poseidon, transcript
from stark_mlwe_tpu.spec.field import P


def test_params_exist_for_supported_widths():
    for t in (9, 17, 33, 65, 129):
        p = poseidon.params_for_width(t)
        assert p.t == t and p.rate == t - 1 and p.rf == 8
        assert p.rp == poseidon.RP_FOR_T[t]
        assert len(p.mds) == t and len(p.mds[0]) == t
        assert len(p.rc_full) == 8 and len(p.rc_full[0]) == t
        assert len(p.rc_partial) == p.rp


def test_arity_width_mapping():
    for arity, t in ((2, 9), (8, 9), (16, 17), (32, 33), (64, 65), (128, 129)):
        assert poseidon.width_for_arity(arity) == t


def test_static_seed_t17_matches_dynamic_derivation_scheme():
    # Same derivation functions, different seeds -> different constants.
    merkle_p = poseidon.generate_params_t17(b"POSEIDON-T17-X5-SEED")
    tr_p = poseidon.generate_params_t17(b"POSEIDON-T17-X5-TRANSCRIPT")
    dyn_p = poseidon.params_for_width(17)
    assert merkle_p.mds[0][0] != tr_p.mds[0][0]
    assert merkle_p.mds[0][0] != dyn_p.mds[0][0]


def test_permute_deterministic_and_nontrivial():
    p = poseidon.params_for_width(17)
    s0 = list(range(17))
    out1 = poseidon.permute(s0, p)
    out2 = poseidon.permute(s0, p)
    assert out1 == out2
    assert out1 != s0
    assert all(0 <= x < P for x in out1)
    # single-element sensitivity
    s1 = list(s0)
    s1[3] = 99
    assert poseidon.permute(s1, p) != out1


def test_hash_with_ds_chunking():
    p = poseidon.generate_params_t17(b"POSEIDON-T17-X5-SEED")
    xs = list(range(1, 20))  # 19 elements -> 2 chunks
    d1 = poseidon.hash_with_ds(xs, 7, p)
    d2 = poseidon.hash_with_ds(xs, 7, p)
    assert d1 == d2
    assert poseidon.hash_with_ds(xs, 8, p) != d1


def test_dynamic_sponge_padding_distinguishes_trailing_zero():
    p = poseidon.params_for_width(17)
    ds = [16, 0, 0, 0]
    a = poseidon.hash_with_ds_dynamic(ds, [5], p)
    b = poseidon.hash_with_ds_dynamic(ds, [5, 0], p)
    assert a != b


def test_transcript_deterministic_and_sensitive():
    t1 = transcript.Transcript(b"ctx-A")
    t1.absorb_bytes(b"hello")
    c1 = t1.challenges(b"alpha", 3)

    t2 = transcript.Transcript(b"ctx-A")
    t2.absorb_bytes(b"hello")
    c2 = t2.challenges(b"alpha", 3)
    assert c1 == c2
    assert len(set(c1)) == 3

    t3 = transcript.Transcript(b"ctx-A")
    t3.absorb_bytes(b"hellp")
    assert t3.challenge(b"alpha") != c1[0]


def test_transcript_word_packing():
    # 31-byte word packing: 32 bytes -> two words
    words = transcript.bytes_to_field_words(bytes(range(32)))
    assert len(words) == 2
    assert words[1] == 31
    assert transcript.domain_tag_to_field(b"abc") == int.from_bytes(
        b"abc" + b"\x00" * 29, "little")
