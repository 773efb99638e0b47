"""hhsuite_tpu: a TPU-native profile-HMM search framework.

A ground-up JAX/XLA/Pallas implementation with the capabilities of
HH-suite3 (hhblits/hhsearch/hhalign + MSA/HMM tooling): profile HMMs are
batched arrays, alignment DP runs as device kernels over length-bucketed
template batches, and scale-out uses jax.sharding meshes instead of
OpenMP/MPI.
"""

__version__ = "0.1.0"


def _tune_malloc():
    """Keep large freed buffers in the heap instead of munmap'ing them.

    glibc's default dynamic mmap threshold makes every >32 MB numpy
    staging buffer a fresh mmap whose pages must be faulted in on first
    touch; on the target hosts cold faults run at ~30-160 MB/s, slower
    than the TPU computes.  Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD
    lets the allocator recycle already-faulted pages (measured 128 ms ->
    2 ms per 21 MB buffer).  Opt out with HHSUITE_TPU_NO_MALLOC_TUNE=1."""
    import os

    if os.environ.get("HHSUITE_TPU_NO_MALLOC_TUNE"):
        return
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass


_tune_malloc()
