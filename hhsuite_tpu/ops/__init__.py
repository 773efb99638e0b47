"""Device kernels (Pallas / lax.scan) and their host-side glue.

Shared helper: :func:`start_host_copy` — begin streaming device
results to the host without blocking.  Every funnel stage that uses
the dispatch-all-then-fetch pattern calls this at dispatch time so the
device->host copies overlap remaining device work; the tunneled-TPU
link otherwise charges a full round-trip (~70 ms) per synchronous
fetch (measured: 8 pre-computed fetches cost 0.57 s synchronous vs
0.20 s with async copies started first).
"""


def start_host_copy(*arrays) -> None:
    """Enqueue non-blocking device->host copies for any jax.Arrays in
    ``arrays`` (numpy arrays and None pass through silently).  The
    subsequent ``np.asarray(a)`` then finds the data already on host
    (or in flight) instead of paying a fresh round-trip."""
    for a in arrays:
        fn = getattr(a, "copy_to_host_async", None)
        if fn is None:
            continue
        try:
            fn()
        except Exception:
            pass
