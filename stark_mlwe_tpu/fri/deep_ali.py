"""DEEP-ALI constraint merge on device.

Mirrors /root/reference/crates/deep_ali/src/lib.rs:48-105 (golden spec in
`spec.deep_ali`), TPU-first:

  - Phi = a*s + e - t (+ beta*R) is one fused elementwise pass over the
    sharded evaluation vector,
  - the barycentric Lagrange evaluation and the f0 quotient use
    `fr.batch_inv` (log-depth prefix-product scans) where the reference
    does O(n) per-element modular exponentiations
    (deep_ali/src/lib.rs:40,100),
  - omega power tables come from a device associative scan.

Returns the f0 evaluation vector in Montgomery form, ready for FRI
folding without leaving HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import fr
from ..spec.field import P


@jax.jit
def _merge_kernel(a, s, e, t, w, z_m, scale_m):
    """phi = a*s+e-t;  f0 = phi / (w - z);  phi_z = scale * sum(phi*w/(z-w)).

    w: [n,16] omega power table (Montgomery); z_m, scale_m: [16] consts.
    scale = Z_H(z) / n (host-computed).  Returns (f0 [n,16], phi_z [16]).
    """
    phi = fr.sub(fr.add(fr.mont_mul(a, s), e), t)
    dz = fr.sub(w, z_m[None, :])            # w - z, nonzero since z not in H
    invs = fr.batch_inv(dz)
    f0 = fr.mont_mul(phi, invs)
    # sum phi * w / (z - w) = -sum phi * w * invs
    terms = fr.mont_mul(fr.mont_mul(phi, w), invs)
    ssum = fr.neg(fr.reduce_add(terms))
    phi_z = fr.mont_mul(scale_m, ssum)
    return f0, phi_z


@jax.jit
def _merge_kernel_blinded(a, s, e, t, r, beta_m, w, z_m, scale_m):
    phi = fr.sub(fr.add(fr.mont_mul(a, s), e), t)
    phi = fr.add(phi, fr.mont_mul(beta_m[None, :], r))
    dz = fr.sub(w, z_m[None, :])
    invs = fr.batch_inv(dz)
    f0 = fr.mont_mul(phi, invs)
    terms = fr.mont_mul(fr.mont_mul(phi, w), invs)
    ssum = fr.neg(fr.reduce_add(terms))
    phi_z = fr.mont_mul(scale_m, ssum)
    return f0, phi_z


@jax.jit
def phi_kernel(a, s, e, t):
    """phi = a*s + e - t.  Split out of the merge so it can be dispatched
    while the Fiat-Shamir column absorb chain is still running on the
    host — phi has no (z, beta) dependence (deep_ali/src/lib.rs:60-77)."""
    return fr.sub(fr.add(fr.mont_mul(a, s), e), t)


@jax.jit
def _f0_quotient(phi, w, z_m):
    # phi may arrive as uint16 limbs (half-width upload form)
    phi = phi.astype(fr.U32)
    return fr.mont_mul(phi, fr.batch_inv(fr.sub(w, z_m[None, :])))


def f0_from_phi(phi0, w, z: int, beta: int = 0, r_eval=None):
    """f0 = (phi0 [+ beta*r]) / (w - z); same op order as _merge_kernel /
    _merge_kernel_blinded, so results are bit-identical."""
    z_m = jnp.asarray(fr.pack_int(z, mont=True))
    if r_eval is not None:
        beta_m = jnp.asarray(fr.pack_int(beta, mont=True))
        phi0 = fr.add(phi0, fr.mont_mul(beta_m[None, :], r_eval))
    return _f0_quotient(phi0, w, z_m)


def omega_powers(omega: int, n: int):
    """Device power table [1, w, ..., w^(n-1)] (Montgomery)."""
    base = jnp.asarray(fr.pack_int(omega, mont=True))
    return fr.powers(base, n)


class DeviceDomainH:
    """Domain cache with a device omega-power table
    (deep_ali/src/lib.rs:109-215)."""

    def __init__(self, n: int):
        from ..spec.field import get_root_of_unity
        self.n = n
        self.omega = get_root_of_unity(n)
        self.omega_pows = omega_powers(self.omega, n)

    def eval_lagrange(self, values_dev, z: int) -> int:
        """Barycentric evaluation of the interpolant at z (z outside H)."""
        assert pow(z, self.n, P) != 1
        zh = (pow(z, self.n, P) - 1) % P
        scale = zh * pow(self.n % P, P - 2, P) % P
        z_m = jnp.asarray(fr.pack_int(z, mont=True))
        invs = fr.batch_inv(fr.sub(self.omega_pows, z_m[None, :]))
        terms = fr.mont_mul(fr.mont_mul(values_dev, self.omega_pows), invs)
        ssum = fr.neg(fr.reduce_add(terms))
        scale_m = jnp.asarray(fr.pack_int(scale, mont=True))
        out = fr.mont_mul(scale_m, ssum)
        return fr.unpack_ints(out[None, :], mont=True)[0]

    def merge_deep_ali(self, a, s, e, t, z: int):
        return merge_evals_device(a, s, e, t, self.omega, z)

    def merge_deep_ali_blinded(self, a, s, e, t, r_eval, beta: int, z: int):
        return merge_evals_device(a, s, e, t, self.omega, z,
                                  r_eval=r_eval, beta=beta)


def merge_evals_device(a, s, e, t, omega: int, z: int,
                       r_eval=None, beta: int = 0, with_c_star: bool = True):
    """Device DEEP-ALI merge (deep_ali/src/lib.rs:60-105).

    a,s,e,t (and optional r_eval): [n,16] Montgomery device arrays.
    Returns (f0 [n,16] Montgomery, z, c_star int).  with_c_star=False
    skips the device->host sync for c_star (the FRI prover only needs f0;
    each sync over a remote-attached TPU costs ~0.5 s).
    """
    n = int(a.shape[0])
    assert pow(z, n, P) != 1, "z must be outside H"
    zh = (pow(z, n, P) - 1) % P
    n_inv = pow(n % P, P - 2, P)
    scale = zh * n_inv % P
    w = omega_powers(omega, n)
    z_m = jnp.asarray(fr.pack_int(z, mont=True))
    scale_m = jnp.asarray(fr.pack_int(scale, mont=True))
    if r_eval is not None:
        beta_m = jnp.asarray(fr.pack_int(beta, mont=True))
        f0, phi_z = _merge_kernel_blinded(a, s, e, t, r_eval, beta_m,
                                          w, z_m, scale_m)
    else:
        f0, phi_z = _merge_kernel(a, s, e, t, w, z_m, scale_m)
    if not with_c_star:
        return f0, z, None
    phi_z_int = fr.unpack_ints(phi_z[None, :], mont=True)[0]
    c_star = phi_z_int * pow(zh, P - 2, P) % P
    return f0, z, c_star
