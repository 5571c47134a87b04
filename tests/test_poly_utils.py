"""Poly wrapper and utils parity tests."""

import random

from stark_mlwe_tpu.poly import Poly
from stark_mlwe_tpu.spec.field import P
from stark_mlwe_tpu.utils import ByteSize

rng = random.Random(0x90126)


def test_poly_eval_add_scale():
    a = Poly([1, 2, 3])
    b = Poly([5, 0, 0, 7])
    x = rng.randrange(P)
    assert a.evaluate(x) == (1 + 2 * x + 3 * x * x) % P
    assert a.add(b).evaluate(x) == (a.evaluate(x) + b.evaluate(x)) % P
    assert a.scale(9).evaluate(x) == 9 * a.evaluate(x) % P
    assert a.degree() == 2 and b.degree() == 3
    assert Poly([0, 0]).is_zero()


def test_poly_mul_schoolbook_and_ntt():
    for n1, n2 in ((3, 4), (40, 50)):
        a = Poly([rng.randrange(P) for _ in range(n1)])
        b = Poly([rng.randrange(P) for _ in range(n2)])
        c = a.mul(b)
        x = rng.randrange(P)
        assert c.evaluate(x) == a.evaluate(x) * b.evaluate(x) % P
        assert c.degree() == a.degree() + b.degree()


def test_bytesize_format():
    assert str(ByteSize(512)) == "512 B"
    assert str(ByteSize(2048)) == "2.00 KiB"
    assert str(ByteSize(5 * 1024 * 1024)) == "5.00 MiB"
