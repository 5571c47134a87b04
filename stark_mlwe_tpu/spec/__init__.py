"""Golden spec model: pure-Python-int re-statement of the reference semantics.

Everything here is the oracle the TPU kernels are tested against, and also
serves as the (host-side) verifier implementation.  No JAX imports.
"""
