import os, random, subprocess, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from crossval_search import compare
REF = "/tmp/refbuild/src/hhblits"
Q = "/root/repo/tests/fixtures/query.a3m"
DB = "/tmp/vfy/multi"
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
POOL = [
    ["-n", "3"], ["-norealign"], ["-premerge", "0"], ["-premerge", "5"],
    ["-realign_old_hits"], ["-mact", "0.2"], ["-e", "1e-30"],
    ["-neffmax", "4"], ["-cov", "20"], ["-id", "80"], ["-diff", "5"],
    ["-p", "40"], ["-alt", "2"], ["-noprefilt"], ["-interim_filter", "NONE"],
    ["-maxfilt", "10"], ["-min_prefilter_hits", "2"], ["-all"],
]
os.makedirs("/tmp/cv", exist_ok=True)
rng = random.Random(int(sys.argv[1]))
for k in range(int(sys.argv[2])):
    combo = ["-n", "2"]
    for f in rng.sample(POOL, rng.randint(1, 3)):
        combo += f
    tag = f"bl{k:02d}"
    rf, mf = f"/tmp/cv/ref_{tag}.hhr", f"/tmp/cv/my_{tag}.hhr"
    ra, ma = f"/tmp/cv/ref_{tag}.a3m", f"/tmp/cv/my_{tag}.a3m"
    subprocess.run([REF, "-i", Q, "-d", DB, "-nocontxt", "-v", "0",
                    "-o", rf, "-oa3m", ra] + combo, capture_output=True)
    subprocess.run([sys.executable, "-m", "hhsuite_tpu", "hhblits",
                    "-i", Q, "-d", DB, "-nocontxt", "-v", "0",
                    "-o", mf, "-oa3m", ma] + combo, env=ENV,
                   capture_output=True)
    if not (os.path.exists(rf) and os.path.exists(mf)):
        print(f"[{tag}] MISSING {' '.join(combo)}"); continue
    bad = compare(rf, mf)
    with open(ra) as f1, open(ma) as f2:
        if f1.read() != f2.read():
            bad.append("merged a3m differs")
    print(f"[{tag}] {'OK' if not bad else 'DIVERGE'} {' '.join(combo)}")
    for b in bad[:4]:
        print("    ", b)
