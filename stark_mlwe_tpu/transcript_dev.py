"""Device-resident Fiat-Shamir transcript.

Bit-exact counterpart of `spec.transcript.Transcript`
(/root/reference/crates/transcript/src/lib.rs): the t=17 sponge state
lives on device as a [17, 16] Montgomery limb tensor, the rate cursor
and all STATIC absorbed words (DS markers, labels, round indices) are
tracked host-side.  Static words accumulate in a pending host vector and
land as ONE modular add right before each permutation; dynamic values
(device [16] field elements) are added at their rate slot directly.

This makes whole prover FS chains traceable: every absorb/challenge is
ordinary jax ops with static shapes, so a k-round sum-check (claims,
coefficients, challenges, folds) compiles into ONE graph with zero
host<->device synchronisation.  The proof values come back in a single
bulk download afterwards.

The absorb discipline (31-byte word packing, lazy permutation at
rate-full, challenge = CHALLENGE marker + label + forced permute +
state[0]) replays `transcript/src/lib.rs:32-101` exactly; equality with
the host golden model is asserted by tests/test_channel_device.py via
byte-identical proofs.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ops import fr
from .ops import poseidon as dpos
from .spec.field import P
from .spec.transcript import (DS_ABSORB_BYTES, DS_CHALLENGE, RATE, T,
                              Transcript, bytes_to_field_words,
                              default_params, domain_tag_to_field)

_DS_ABS = domain_tag_to_field(DS_ABSORB_BYTES)
_DS_CHAL = domain_tag_to_field(DS_CHALLENGE)


def _dp():
    return dpos.device_params(default_params())


class DeviceTranscript:
    """Transcript with the sponge state on device (see module doc)."""

    def __init__(self, label: bytes):
        host = Transcript(label)  # cheap host replay of the init block
        self._state = jnp.asarray(
            fr.pack_ints(list(host.state), mont=True)).reshape(T, fr.N)
        self.pos = host.pos
        self._pend = [0] * T
        self._has_pend = False
        self._params = _dp()

    # -- internals ---------------------------------------------------------

    def _flush(self) -> None:
        if not self._has_pend:
            return
        cvec = jnp.asarray(fr.pack_ints(self._pend, mont=True)).reshape(
            T, fr.N)
        self._state = fr.add(self._state, cvec)
        self._pend = [0] * T
        self._has_pend = False

    def _permute(self) -> None:
        self._flush()
        self._state = dpos.permute(self._state[None], self._params)[0]
        self.pos = 0

    def _absorb_one_const(self, x: int) -> None:
        if self.pos == RATE:
            self._permute()
        self._pend[self.pos] = (self._pend[self.pos] + x) % P
        self._has_pend = True
        self.pos += 1

    # -- public, mirroring spec.transcript.Transcript ----------------------

    def absorb_bytes(self, data: bytes) -> None:
        self._absorb_one_const(_DS_ABS)
        for w in bytes_to_field_words(data):
            self._absorb_one_const(w)

    def absorb_field_const(self, x: int) -> None:
        self._absorb_one_const(x % P)

    def absorb_field_dev(self, vec) -> None:
        """Absorb a device [16] Montgomery field element."""
        if self.pos == RATE:
            self._permute()
        p = self.pos
        self._state = jnp.concatenate(
            [self._state[:p],
             fr.add(self._state[p:p + 1], vec[None]),
             self._state[p + 1:]], axis=0)
        self.pos += 1

    def challenge_dev(self, label: bytes):
        """transcript/src/lib.rs:92-101; returns device [16] Montgomery."""
        self._absorb_one_const(_DS_CHAL)
        self.absorb_bytes(label)
        self._permute()
        return self._state[0]
