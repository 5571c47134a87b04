"""Spec MLE + DEEP-ALI tests (mirror reference mle/deep_ali test strategy)."""

from stark_mlwe_tpu.spec import deep_ali
from stark_mlwe_tpu.spec.field import P, compute_powers, get_root_of_unity, inv
from stark_mlwe_tpu.spec.mle import MLE
from stark_mlwe_tpu.spec.rng import StdRng


def mle_sum_vars(n):
    return MLE([bin(i).count("1") for i in range(1 << n)])


def test_eval_at_boolean_points_matches_table():
    n = 3
    m = mle_sum_vars(n)
    for idx in range(1 << n):
        r = [(idx >> i) & 1 for i in range(n)]
        assert m.eval(r) == m.values[idx]


def test_fold_last_and_arbitrary_match_eval():
    n = 4
    m = mle_sum_vars(n)
    r = [2, 3, 5, 7]
    direct = m.eval(r)
    folded = m.fold_last(r[n - 1])
    assert folded.eval(r[:n - 1]) == direct
    folded1 = m.fold(1, r[1])
    assert folded1.eval([r[0], r[2], r[3]]) == direct


def test_fix_selects_half():
    n = 3
    m = mle_sum_vars(n)
    fixed = m.fix(1, True)
    for a0 in (0, 1):
        for a2 in (0, 1):
            assert m.eval([a0, 1, a2]) == fixed.eval([a0, a2])


def test_lagrange_on_grid_and_off_grid():
    n = 8
    omega = get_root_of_unity(n)
    rng = StdRng.seed_from_u64(5)
    vals = [rng.ark_fr_rand() for _ in range(n)]
    # on-grid z = omega^3 returns the table value
    assert deep_ali.lagrange_eval_on_h(vals, pow(omega, 3, P), omega) == vals[3]
    # off-grid: constant polynomial evaluates to the constant
    c = 123456789
    assert deep_ali.lagrange_eval_on_h([c] * n, 987654321, omega) == c
    # off-grid: linear polynomial f(x) = 7x + 3
    lin = [(7 * w + 3) % P for w in compute_powers(omega, n)]
    z = 55555
    assert deep_ali.lagrange_eval_on_h(lin, z, omega) == (7 * z + 3) % P


def test_batch_inverse():
    xs = [2, 3, 5, P - 1]
    for x, xi in zip(xs, deep_ali.batch_inverse(xs)):
        assert x * xi % P == 1


def test_merge_satisfied_relation_quotient_consistency():
    """When a*s + e = t on H, Phi = 0, so f0 = 0 and c* = 0."""
    n = 16
    dom = deep_ali.DomainH(n)
    rng = StdRng.seed_from_u64(9)
    a = [rng.ark_fr_rand() for _ in range(n)]
    s = [rng.ark_fr_rand() for _ in range(n)]
    e = [rng.ark_fr_rand() for _ in range(n)]
    t = [(a[i] * s[i] + e[i]) % P for i in range(n)]
    z, _beta = deep_ali.sample_z_beta_from_seed(77, n)
    f0, z_out, c_star = dom.merge_deep_ali(a, s, e, t, z)
    assert z_out == z
    assert c_star == 0
    assert all(v == 0 for v in f0)


def test_merge_unsatisfied_is_nonzero_and_consistent():
    n = 16
    dom = deep_ali.DomainH(n)
    rng = StdRng.seed_from_u64(10)
    a = [rng.ark_fr_rand() for _ in range(n)]
    s = [rng.ark_fr_rand() for _ in range(n)]
    e = [rng.ark_fr_rand() for _ in range(n)]
    t = [rng.ark_fr_rand() for _ in range(n)]
    z, beta = deep_ali.sample_z_beta_from_seed(78, n)
    f0, _, c_star = dom.merge_deep_ali(a, s, e, t, z)
    assert any(v != 0 for v in f0)
    # definition check at one grid point j: f0[j]*(w^j - z) == Phi[j]
    j = 5
    phi_j = (a[j] * s[j] + e[j] - t[j]) % P
    assert f0[j] * (dom.omega_pows[j] - z) % P == phi_j
    # blinded variant differs unless beta = 0
    r_eval = [rng.ark_fr_rand() for _ in range(n)]
    f0b, _, _ = dom.merge_deep_ali_blinded(a, s, e, t, r_eval, beta, z)
    assert f0b != f0
    f0z, _, _ = dom.merge_deep_ali_blinded(a, s, e, t, r_eval, 0, z)
    assert f0z == f0
