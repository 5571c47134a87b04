"""tpu-stark-mlwe: a TPU-native STARK/FRI proving library (JAX/XLA/Pallas).

Re-implements, TPU-first, the full capability surface of the reference Rust
workspace `saholmes/stark-mlwe` (see SURVEY.md): Pallas-Fr field kernels,
Poseidon permutations and DS-hygienic m-ary Merkle trees, a Poseidon
Fiat-Shamir transcript/channel, radix-2 NTT/iNTT, DEEP-ALI constraint
merging for the MLWE relation a*s + e = t, generalized m-ary FRI with
batched query openings, and the sum-check NIZK track (plain + Merkle-folded).

Layout:
  spec/      pure-Python golden model (the bit-exactness oracle + verifier)
  ops/       device kernels: Fr limb arithmetic, Poseidon, NTT (jnp + Pallas)
  merkle/    batched device tree engine
  fri/       FRI prover on device kernels
  stark/     MLWE end-to-end prove/verify + NIZK wire API
  parallel/  mesh/sharding utilities and multi-chip paths
"""

__version__ = "0.1.0"
