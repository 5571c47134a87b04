"""TPU-native compute kernels: field arithmetic, Poseidon, NTT."""
