"""Opt-in real-hardware regression tier (azure-pipelines.yml:81-160
analogue: the reference runs its regression on EVERY build target).

The normal suite pins JAX_PLATFORMS=cpu (conftest), so the TPU-compiled
Mosaic kernels are exercised only here and by bench.py's
bench_tpu_golden.  Run with::

    HHSUITE_TPU_TPU_TESTS=1 python -m pytest tests/test_tpu_golden.py

The test spawns a clean interpreter WITHOUT the cpu-forcing env so the
platform plugin (axon tunnel or real TPU runtime) selects the chip; it
skips when opting in is absent or no accelerator is attached.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("HHSUITE_TPU_TPU_TESTS") != "1",
                    reason="opt-in: set HHSUITE_TPU_TPU_TESTS=1")
def test_golden_search_on_real_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        " --xla_force_host_platform_device_count=8", "")
    r = subprocess.run(
        [sys.executable, "-c",
         "import json; from hhsuite_tpu.tools.tpu_check import "
         "run_check; print('VERDICT' + json.dumps(run_check()))"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("VERDICT")][-1]
    verdict = json.loads(line[len("VERDICT"):])
    if verdict["platform"] == "cpu":
        pytest.skip("no accelerator attached — platform fell back to "
                    "cpu")
    assert verdict["pass"], json.dumps(verdict, indent=1)


def test_comparators_accept_reference_goldens():
    """The TPU comparison rules must accept the reference's own output
    (self-comparison), tolerate ONLY the measured bf16-dot failure
    mode (<=2-cell coordinate drift, capped at 4 rows — ADVICE r4
    restricted the tolerance to coordinate columns and capped the
    pairs), and reject anything beyond it."""
    from hhsuite_tpu.tools.tpu_check import (_MAX_PLATEAU_ROWS,
                                             _hhr_summary_compare,
                                             _m8_compare)

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    with open(f"{fix}/golden_multi_search.blasttab") as f:
        m8 = f.read()
    assert _m8_compare(m8, m8) == []
    # a 1-2 cell plateau flip is tolerated; >2 cells is rejected
    plateau = m8.replace("\t1\t431\t", "\t2\t431\t", 1)
    assert _m8_compare(plateau, m8) == []
    corrupted = m8.replace("\t1\t431\t", "\t9\t431\t", 1)
    assert _m8_compare(corrupted, m8) != []
    # ... and the plateau exception is CAPPED: flipping a coordinate
    # on more rows than the cap must fail as systematic drift
    many = m8
    lines = many.splitlines()
    flipped = []
    for ln in lines:
        t = ln.split("\t")
        if len(t) == 12 and len(flipped) <= _MAX_PLATEAU_ROWS:
            t[6] = str(int(t[6]) + 1)
            flipped.append(1)
        ln2 = "\t".join(t)
        many = many.replace(ln, ln2, 1)
    assert _m8_compare(many, m8) != []
    # stat columns keep a printed-precision window; big jumps fail
    t = lines[0].split("\t")
    t[11] = str(float(t[11]) + 0.1)
    ok = "\n".join(["\t".join(t)] + lines[1:]) + "\n"
    assert _m8_compare(ok, m8) == []
    t[11] = str(float(t[11]) + 50.0)
    bad = "\n".join(["\t".join(t)] + lines[1:]) + "\n"
    assert _m8_compare(bad, m8) != []

    with open(f"{fix}/golden_multi_search.hhr") as f:
        hhr = f.read().split("\nNo 1\n")[0] + "\n"
    assert _hhr_summary_compare(hhr, hhr) == []
    # a 1-cell coordinate flip is a tolerated plateau; big drift fails
    drift = hhr.replace("1-431     1-431", "1-431     2-431", 1)
    assert _hhr_summary_compare(drift, hhr) == []
    big = hhr.replace("1-431     1-431", "1-431     9-431", 1)
    assert _hhr_summary_compare(big, hhr) != []
