"""Device multilinear extensions: batched pairwise/strided folding.

Mirrors /root/reference/crates/mle/src/lib.rs and the channel-internal Mle
(channel/src/lib.rs:252-297), bit-exact vs `spec.mle.MLE`.  Values live on
device as [2^n, 16] Montgomery limb tensors; folds are fused reshape +
multiply-add passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops import fr
from .spec.field import P


@jax.jit
def _fold_pairs(v, om_m, r_m):
    """v: [h, 2, 16] -> (1-r)*v0 + r*v1: [h, 16]."""
    return fr.add(fr.mont_mul(om_m[None, :], v[:, 0, :]),
                  fr.mont_mul(r_m[None, :], v[:, 1, :]))


def _consts(r_i: int):
    om = (1 - r_i) % P
    return (jnp.asarray(fr.pack_int(om, mont=True)),
            jnp.asarray(fr.pack_int(r_i, mont=True)))


class DeviceMLE:
    """values: [2^n, 16] Montgomery device array."""

    def __init__(self, values_dev):
        n = int(values_dev.shape[0])
        assert n & (n - 1) == 0 and n > 0
        self.values_dev = values_dev
        self.n = n.bit_length() - 1
        self._ints = None

    @classmethod
    def from_ints(cls, values):
        return cls(jnp.asarray(fr.pack_ints(list(values), mont=True)))

    def values(self) -> list:
        if self._ints is None:
            self._ints = fr.unpack_ints(self.values_dev, mont=True)
        return self._ints

    def value_at(self, indices) -> list:
        if self._ints is not None:
            return [self._ints[i] for i in indices]
        g = jnp.take(self.values_dev, jnp.asarray(list(indices)), axis=0)
        return fr.unpack_ints(g, mont=True)

    def sum(self) -> int:
        s = fr.reduce_add(self.values_dev)
        return fr.unpack_ints(s[None, :], mont=True)[0]

    def fold_last(self, r_i: int) -> "DeviceMLE":
        """Low-bit pairwise fold (mle/src/lib.rs:78-94)."""
        if self.n == 0:
            return self
        om_m, r_m = _consts(r_i)
        h = 1 << (self.n - 1)
        v = self.values_dev.reshape(h, 2, fr.N)
        return DeviceMLE(_fold_pairs(v, om_m, r_m))

    def fold(self, var_idx: int, r_i: int) -> "DeviceMLE":
        """Strided fold at variable var_idx (mle/src/lib.rs:133-161)."""
        assert var_idx < self.n
        om_m, r_m = _consts(r_i)
        stride = 1 << var_idx
        v = self.values_dev.reshape(-1, 2, stride, fr.N)
        out = fr.add(fr.mont_mul(om_m[None, None, :], v[:, 0, :, :]),
                     fr.mont_mul(r_m[None, None, :], v[:, 1, :, :]))
        return DeviceMLE(out.reshape(-1, fr.N))

    def fix(self, var_idx: int, bit: bool) -> "DeviceMLE":
        """Boolean projection (mle/src/lib.rs:100-128)."""
        assert var_idx < self.n
        stride = 1 << var_idx
        v = self.values_dev.reshape(-1, 2, stride, fr.N)
        return DeviceMLE(v[:, 1 if bit else 0, :, :].reshape(-1, fr.N))

    def eval(self, r: list) -> int:
        """Multilinear evaluation by repeated low-bit folds
        (mle/src/lib.rs:50-73)."""
        assert len(r) == self.n
        cur = self
        for ri in r:
            cur = cur.fold_last(ri)
        return fr.unpack_ints(cur.values_dev, mont=True)[0]
