"""Spec-model field tests (mirror reference field/utils unit tests)."""

from stark_mlwe_tpu.spec import field
from stark_mlwe_tpu.spec.rng import StdRng


def test_modulus_and_two_adicity():
    assert field.P.bit_length() == 255
    assert (field.P - 1) % (1 << 32) == 0
    root = field.TWO_ADIC_ROOT_OF_UNITY
    assert pow(root, 1 << 32, field.P) == 1
    assert pow(root, 1 << 31, field.P) != 1


def test_domain_basic():
    dom = field.Domain(4)
    assert dom.size == 16
    assert pow(dom.omega, 16, field.P) == 1
    assert pow(dom.omega, 8, field.P) != 1


def test_domain_iter_and_elements():
    dom = field.Domain(3)
    dom.precompute_elements()
    elems = list(dom)
    assert elems == dom.elements
    assert elems[0] == 1
    assert elems[1] == dom.omega
    assert elems[2] == dom.omega * dom.omega % field.P


def test_serialize_roundtrip():
    x = 42
    assert field.fr_from_bytes(field.fr_to_bytes(x)) == x
    big = field.P - 1
    assert field.fr_from_bytes(field.fr_to_bytes(big)) == big


def test_domain_2048_distinct():
    omega, n = field.make_domain_2048()
    assert n == 2048
    elems = set()
    acc = 1
    for _ in range(n):
        elems.add(acc)
        acc = acc * omega % field.P
    assert len(elems) == n


def test_fr_hash_deterministic():
    a = field.fr_from_hash("TAG", b"data")
    b = field.fr_from_hash("TAG", b"data")
    c = field.fr_from_hash("TAG", b"data2")
    assert a == b
    assert a != c
    assert 0 <= a < field.P


def test_salt_and_ds_tag():
    seed = bytes([7] * 32)
    s1 = field.salt_for_node(0, 0, seed)
    s2 = field.salt_for_node(0, 1, seed)
    s3 = field.salt_for_node(1, 0, seed)
    assert len({s1, s2, s3}) == 3
    assert field.ds_tag_for_arity(16) != field.ds_tag_for_arity(32)


def test_montgomery_roundtrip():
    x = 0x1234567890ABCDEF
    mont = x * field.R_MONT % field.P
    assert field.from_montgomery_limbs(mont) == x


def test_ark_rand_in_range_and_deterministic():
    r1 = StdRng.seed_from_u64(123)
    r2 = StdRng.seed_from_u64(123)
    xs = [r1.ark_fr_rand() for _ in range(8)]
    ys = [r2.ark_fr_rand() for _ in range(8)]
    assert xs == ys
    assert all(0 <= x < field.P for x in xs)
    assert len(set(xs)) == 8


def test_fr_tag_to_u64():
    assert field.fr_tag_to_u64(2025) == 2025
    assert field.fr_tag_to_u64((1 << 64) + 5) == 5
