"""hhsuite_tpu: a TPU-native profile-HMM search framework.

A ground-up JAX/XLA/Pallas implementation with the capabilities of
HH-suite3 (hhblits/hhsearch/hhalign + MSA/HMM tooling): profile HMMs are
batched arrays, alignment DP runs as device kernels over length-bucketed
template batches, and scale-out uses jax.sharding meshes instead of
OpenMP/MPI.
"""

__version__ = "0.1.0"
