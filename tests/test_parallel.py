"""Sharded prove step on the virtual 8-device mesh == single-chip results.

Compile-cost note: every (topology, shape) pair is a separate multi-hour
XLA-CPU compile of the sharded step on a cold cache, so the default run
tests ONE topology (8 devices) with the SAME shapes as
`__graft_entry__.dryrun_multichip` (n = 64*n_dev, m = arity = 4) - the
two share a persistent-cache entry.  Set STARK_TESTS_HEAVY=1 to add the
other topologies.
"""

import os
import random

import numpy as np
import pytest

HEAVY = os.environ.get("STARK_TESTS_HEAVY", "0") not in ("", "0")


def heavy_param(p):
    return pytest.param(
        p, marks=[] if HEAVY else pytest.mark.skip(
            reason="extra mesh topology (STARK_TESTS_HEAVY=1)"))

import jax
import jax.numpy as jnp

from stark_mlwe_tpu import parallel as par
from stark_mlwe_tpu.fri import deep_ali as dali, fold_layer_dev, fs
from stark_mlwe_tpu.merkle import build_tree
from stark_mlwe_tpu.ops import fr
from stark_mlwe_tpu.spec.field import P, get_root_of_unity
from stark_mlwe_tpu.spec.merkle import MerkleChannelCfg

rng = random.Random(0x5A5A)


def rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]


def dev(xs):
    return jnp.asarray(fr.pack_ints(xs, mont=True))


@pytest.mark.parametrize("n_dev", [heavy_param(1), heavy_param(2), 8])
def test_sharded_step_matches_single_chip(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    n, m, arity = 64 * n_dev, 4, 4
    mesh = par.make_mesh(n_dev)
    step, ds_locals, _ = par.build_sharded_prove_step(mesh, n, m, arity)

    a, s, e, t = (rand_elems(n) for _ in range(4))
    omega = get_root_of_unity(n)
    z = 0x1234567  # outside H with overwhelming probability; assert anyway
    assert pow(z, n, P) != 1
    zh = (pow(z, n, P) - 1) % P
    scale = zh * pow(n % P, P - 2, P) % P
    z_fold = 0xABCDEF
    fold_A = jnp.asarray(fr.mat_scale([[pow(z_fold, j, P)
                                        for j in range(m)]]))

    da, ds_, de, dt_ = map(dev, (a, s, e, t))
    w = fr.powers(jnp.asarray(fr.pack_int(omega, mont=True)), n)
    z_m = jnp.asarray(fr.pack_int(z, mont=True))
    scale_m = jnp.asarray(fr.pack_int(scale, mont=True))

    root_l, phi_z, f1 = step(da, ds_, de, dt_, w, z_m, scale_m, fold_A,
                             *ds_locals)
    root = fr.unpack_ints(fr.from_mont(root_l[None, :]))[0]
    phi_z_int = fr.unpack_ints(phi_z[None, :], mont=True)[0]
    f1_ints = fr.unpack_ints(f1, mont=True)

    # single-chip reference path
    f0_ref, _, _ = dali.merge_evals_device(da, ds_, de, dt_, omega, z)
    f1_ref = fold_layer_dev(f0_ref, z_fold, m)
    assert f1_ints == fr.unpack_ints(f1_ref, mont=True)

    nb = n // m
    s0_ref = jnp.broadcast_to(f1_ref[:, None, :],
                              (nb, m, fr.N)).reshape(n, fr.N)
    leaves = fs.hash_leaf_pairs_dev(f0_ref, s0_ref)
    tree = build_tree(leaves, MerkleChannelCfg.new(arity, tree_label=0))
    assert root == tree.root()

    # lagrange partial sum cross-check via spec formula
    from stark_mlwe_tpu.spec.deep_ali import lagrange_eval_on_h
    phi_spec = [(a[i] * s[i] + e[i] - t[i]) % P for i in range(n)]
    assert phi_z_int == lagrange_eval_on_h(phi_spec, z, omega)


@pytest.mark.parametrize("n_dev,n1,n2", [
    (2, 16, 16), (8, 16, 16), (2, 64, 64), (8, 64, 64),
    pytest.param(8, 256, 256, marks=[] if HEAVY else pytest.mark.skip(
        reason="2^16 sharded NTT (STARK_TESTS_HEAVY=1)"))])
def test_ntt_sharded_matches_single_chip(n_dev, n1, n2):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    from stark_mlwe_tpu.ops import ntt as dntt

    n = n1 * n2
    mesh = par.make_mesh(n_dev)
    fn, tw = par.build_ntt_sharded(mesh, n1, n2)
    c = rand_elems(n)
    x = dev(c)
    got = fr.unpack_ints(fn(x, jnp.asarray(tw)), mont=True)
    want = fr.unpack_ints(dntt.ntt(x), mont=True)
    assert got == want
