"""Cross-process collective merge: 2 jax.distributed CPU processes run
``parallel.mesh.global_topk_scores`` over disjoint DB shards and must
produce identical global top-k lists that match a plain numpy merge of
the full score set.  This exercises the Gloo/ICI all_gather path the
multi-host DB-sharding design rides (SURVEY §5 distributed backend) —
not just single-process shard_map.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RANK_PROG = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
rank = int(sys.argv[1]); coord = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=rank)
import numpy as np
from hhsuite_tpu.parallel.mesh import global_topk_scores

# disjoint per-rank shards of one global score set (seeded, uneven len)
rng = np.random.default_rng(42)
full = rng.normal(size=23).astype(np.float32)
shard = full[:13] if rank == 0 else full[13:]
s, p, i = global_topk_scores(shard, k=6)
print("RESULT" + json.dumps({"rank": rank,
                             "s": np.round(s, 5).tolist(),
                             "p": p.tolist(), "i": i.tolist()}))
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_single_process_topk_matches_numpy():
    from hhsuite_tpu.parallel.mesh import global_topk_scores

    rng = np.random.default_rng(0)
    x = rng.normal(size=50).astype(np.float32)
    s, p, i = global_topk_scores(x, k=7)
    ref = np.argsort(-x, kind="stable")[:7]
    np.testing.assert_array_equal(i, ref.astype(np.int32))
    np.testing.assert_array_equal(s, x[ref])
    assert (p == 0).all()


@pytest.mark.slow
def test_two_process_distributed_topk_merge():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # drop the 8-virtual-device flag the conftest sets: each rank should
    # own exactly its one local CPU device
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        " --xla_force_host_platform_device_count=8", "")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    coord = f"127.0.0.1:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, "-c", _RANK_PROG, str(r), coord],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE) for r in range(2)]
    outs = []
    for r, pr in enumerate(procs):
        out, err = pr.communicate(timeout=240)
        assert pr.returncode == 0, f"rank {r}: {err.decode()[-2000:]}"
        line = [ln for ln in out.decode().splitlines()
                if ln.startswith("RESULT")][-1]
        outs.append(json.loads(line[len("RESULT"):]))

    # both ranks computed the identical global answer
    assert outs[0]["s"] == outs[1]["s"]
    assert outs[0]["p"] == outs[1]["p"]
    assert outs[0]["i"] == outs[1]["i"]

    # and it matches the host-side merge of the full score set
    rng = np.random.default_rng(42)
    full = rng.normal(size=23).astype(np.float32)
    ref_order = np.argsort(-full, kind="stable")[:6]
    np.testing.assert_allclose(outs[0]["s"], np.round(full[ref_order],
                                                      5), atol=1e-6)
    # global index = (process, local index)
    got_global = [i + (13 if p == 1 else 0)
                  for p, i in zip(outs[0]["p"], outs[0]["i"])]
    assert got_global == ref_order.tolist()
