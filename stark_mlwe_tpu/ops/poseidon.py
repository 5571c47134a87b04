"""Batched Poseidon permutation and sponges on TPU.

Device counterpart of the reference's Poseidon
(/root/reference/crates/poseidon/src/lib.rs:31-68 static t=17,
:219-258 dynamic widths t in {9,17,33,65,129}), bit-exact against the
golden spec in `stark_mlwe_tpu.spec.poseidon`.

TPU-first structure:
  - state batches are [B, t, 16] Montgomery limb tensors,
  - rounds run under `lax.scan` with the round constants as scan inputs
    (small compiled graph, no per-round dispatch),
  - the t x t MDS matmul is ONE fused `fr.mat_apply` per round: the row
    sums are accumulated unreduced and Montgomery-reduced once per output
    element (instead of t^2 modular multiplies + t modular adds),
  - sponges precompute their absorb schedule statically (block boundaries,
    10* padding position) so each batched hash is a fixed sequence of
    block-add + permute steps.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..spec.poseidon import PoseidonParams
from . import fr


class DeviceParams:
    """Poseidon parameters packed for device kernels."""

    __slots__ = ("t", "rate", "rf", "rp", "mds_scaled", "rc_full", "rc_part",
                 "rc_sched", "full_sched", "spec_params")

    def __init__(self, params: PoseidonParams):
        self.spec_params = params
        self.t = params.t
        self.rate = params.rate
        self.rf = params.rf
        self.rp = params.rp
        # numpy (not device) constants: safe to build/cache inside traced
        # contexts - they become per-trace XLA constants at use sites.
        self.mds_scaled = fr.mat_scale(params.mds)
        self.rc_full = fr.pack_ints(
            [c for row in params.rc_full for c in row],
            mont=True).reshape(params.rf, params.t, fr.N)
        self.rc_part = fr.pack_ints(params.rc_partial, mont=True)
        # Unified round schedule for the single-body XLA scan: rc row per
        # round ([R, t, 16]; partial rounds put their constant in lane 0
        # and zeros elsewhere, matching the lane-0-only ARK) + full flags.
        half = params.rf // 2
        t, R = params.t, params.rf + params.rp
        rc_sched = np.zeros((R, t, fr.N), dtype=np.uint32)
        rc_sched[:half] = self.rc_full[:half]
        rc_sched[half:half + params.rp, 0, :] = self.rc_part
        rc_sched[half + params.rp:] = self.rc_full[half:]
        self.rc_sched = rc_sched
        full = np.zeros((R,), dtype=bool)
        full[:half] = True
        full[half + params.rp:] = True
        self.full_sched = full


_CACHE: dict = {}


def device_params(params: PoseidonParams) -> DeviceParams:
    """Memoized packing (spec params are lru_cache singletons)."""
    key = id(params)
    if key not in _CACHE:
        _CACHE[key] = DeviceParams(params)
    return _CACHE[key]


def _pallas_enabled() -> bool:
    import os
    if os.environ.get("STARK_MLWE_NO_PALLAS", "0") not in ("", "0"):
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def permute(state, dp: DeviceParams):
    """Batched permutation: state [..., t, 16] Montgomery -> same shape.

    Mirrors poseidon/src/lib.rs:31-68: RF/2 full rounds, RP partial rounds
    (S-box on lane 0 only), RF/2 full rounds; ARK -> S-box -> MDS order.

    On TPU, 3-D batches dispatch to the fused Pallas kernel (one launch
    per call); elsewhere the lax.scan XLA formulation below runs.
    """
    if state.ndim == 3 and _pallas_enabled():
        from . import poseidon_pallas
        if poseidon_pallas.pallas_supported(dp.t):
            return poseidon_pallas.permute(state, dp)
        from . import poseidon_wide
        if poseidon_wide.wide_supported(dp.t):
            return poseidon_wide.permute(state, dp)

    # ONE scan body for all RF+RP rounds (the full/partial distinction is
    # a per-round select): a third of the traced-graph size of separate
    # full/partial scans - XLA-CPU compile time for the sharded-step
    # graphs is dominated by the op count of these bodies.
    def round_body(s, xs):
        rc, full = xs
        x = fr.add(s, rc)
        x5 = fr.pow5(x)
        sel = jnp.where(
            full,
            x5,
            jnp.concatenate([x5[..., :1, :], x[..., 1:, :]], axis=-2))
        return fr.mat_apply(dp.mds_scaled, sel), None

    state, _ = jax.lax.scan(
        round_body, state, (jnp.asarray(dp.rc_sched),
                            jnp.asarray(dp.full_sched)))
    return state


def _set_lanes(state, start: int, block):
    """state[..., start:start+k, :] += block (absorption add), statically."""
    k = block.shape[-2]
    piece = fr.add(state[..., start:start + k, :], block)
    return jnp.concatenate(
        [state[..., :start, :], piece, state[..., start + k:, :]], axis=-2)


def absorb_blocks(state, blocks, dp: DeviceParams):
    """Absorb rate-aligned blocks: blocks [nb, ..., rate, 16] via lax.scan.

    Each step adds one block into the rate lanes and permutes.  Used for
    long-vector Fiat-Shamir absorption (fri.rs:28-35 over full witness
    columns) where the sponge chain is sequential but each step is a
    batched device permutation.
    """

    def step(s, blk):
        s = _set_lanes(s, 0, blk)
        return permute(s, dp), None

    state, _ = jax.lax.scan(step, state, blocks)
    return state


def sponge_hash_ds_dynamic(ds_fields, inputs, dp: DeviceParams):
    """Batched `hash_with_ds_dynamic` (poseidon/src/lib.rs:288-312).

    ds_fields: [..., d, 16]; inputs: [..., k, 16] (Montgomery).  The DS
    preamble, inputs, the 10* pad marker and zero padding are laid out
    statically into rate-sized blocks; one permutation per block.
    """
    d = ds_fields.shape[-2]
    k = inputs.shape[-2]
    rate, t = dp.rate, dp.t
    total = d + k + 1  # + pad marker
    nblocks = -(-total // rate)
    padded = nblocks * rate

    batch = jnp.broadcast_shapes(ds_fields.shape[:-2], inputs.shape[:-2])
    one = jnp.broadcast_to(fr.MONT_ONE, batch + (1, fr.N))
    zeros = jnp.zeros(batch + (padded - total, fr.N), dtype=fr.U32)
    seq = jnp.concatenate([
        jnp.broadcast_to(ds_fields, batch + (d, fr.N)),
        jnp.broadcast_to(inputs, batch + (k, fr.N)),
        one, zeros], axis=-2)

    state = jnp.zeros(batch + (t, fr.N), dtype=fr.U32)
    if nblocks == 1:
        state = _set_lanes(state, 0, seq)
        state = permute(state, dp)
    else:
        blocks = jnp.moveaxis(
            seq.reshape(batch + (nblocks, rate, fr.N)), -3, 0)
        state = absorb_blocks(state, blocks, dp)
    return state[..., 0, :]


def sponge_hash_ds_legacy(inputs, ds_tag_mont, dp: DeviceParams):
    """Batched legacy `hash_with_ds` (poseidon/src/lib.rs:85-100).

    DS tag sits in the capacity lane; inputs are absorbed in raw
    rate-chunks with NO padding; digest = state[0].
    ds_tag_mont: [16] Montgomery limbs of the tag.
    """
    k = inputs.shape[-2]
    rate, t = dp.rate, dp.t
    batch = inputs.shape[:-2]
    state = jnp.zeros(batch + (t, fr.N), dtype=fr.U32)
    cap = jnp.broadcast_to(ds_tag_mont, batch + (1, fr.N))
    state = jnp.concatenate([state[..., :t - 1, :], cap], axis=-2)
    nb_full, rem = k // rate, k % rate
    if nb_full == 1:
        state = _set_lanes(state, 0, inputs[..., :rate, :])
        state = permute(state, dp)
    elif nb_full:
        blocks = jnp.moveaxis(
            inputs[..., :nb_full * rate, :].reshape(
                batch + (nb_full, rate, fr.N)), -3, 0)
        state = absorb_blocks(state, blocks, dp)
    if rem:
        state = _set_lanes(state, 0, inputs[..., nb_full * rate:, :])
        state = permute(state, dp)
    return state[..., 0, :]
