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


def _enable_compilation_cache():
    """Point JAX at a persistent compilation cache.

    XLA compiles each (kernel, shape) server-side at ~10-60 s on
    remote-TPU setups; with the persistent cache, repeat CLI processes
    load compiled programs in <1 s instead of recompiling.  Respects an
    existing JAX_COMPILATION_CACHE_DIR; opt out with
    HHSUITE_TPU_NO_COMPILATION_CACHE=1.  Safe to call before or after
    jax is first imported (the env var is read lazily; if jax is already
    live we set the config knob directly)."""
    import os
    import sys

    if os.environ.get("HHSUITE_TPU_NO_COMPILATION_CACHE"):
        return
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "jax_comp")
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        return
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    # cache EVERY program: jax's default skips entries that compile in
    # <1 s CLIENT-side, but on tunneled TPUs the client compile is the
    # cheap half — the server-side Mosaic build happens at first
    # execution and is skipped only on a cache HIT, so the sub-second
    # Pallas kernels are exactly the ones worth caching (measured r5:
    # first-run 512-point 53 s cold -> 13.6 s with a full cache)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0")
    if "jax" in sys.modules:   # env no longer read: set config directly
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0)
        except Exception:
            pass


_tune_malloc()
_enable_compilation_cache()
