"""Benchmark: Viterbi DP-cell throughput (GCUPS) of the wavefront kernel.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: hhblits-AVX2 best case ~10 GCUPS/socket (BASELINE.md derived
estimate: 8 f32 lanes x ~1 cell/lane/cycle-ish per core).
"""

import json
import sys
import time

import numpy as np

BASELINE_GCUPS = 10.0


def main():
    import jax

    from __graft_entry__ import _example_pair
    from hhsuite_tpu.ops.viterbi import viterbi_batch

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if on_tpu:
        Lq, Lt, B = 400, 400, 64
    else:
        Lq, Lt, B = 128, 128, 8

    qp, qtr, tp, ttr, cell_off, t_L = _example_pair(Lq=Lq, Lt=Lt, B=B,
                                                    seed=1)
    args = (qp, qtr, tp, ttr, cell_off, t_L, np.float32(-0.03),
            np.float32(0.0), np.float32(0.0), np.float32(0.0))

    # warm-up / compile
    out = viterbi_batch(*args, local=True, need_bt=True)
    jax.block_until_ready(out)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = viterbi_batch(*args, local=True, need_bt=True)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    cells = B * Lq * Lt
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "viterbi_gcups_per_chip",
        "value": round(gcups, 4),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 4),
    }))


if __name__ == "__main__":
    main()
