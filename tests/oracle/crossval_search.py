"""Randomized option cross-validation: reference hhsearch vs ours."""
import os, random, re, subprocess, sys

REF = "/tmp/refbuild/src/hhsearch"
Q = "/root/repo/tests/fixtures/query.a3m"
DB = "/tmp/vfy/multi"
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")

POOL = [
    ["-ssm", "0"], ["-ssm", "1"], ["-glob"], ["-mact", "0.2"],
    ["-mact", "0.5"], ["-alt", "3"], ["-cov", "30"], ["-qid", "25"],
    ["-qsc", "10"], ["-shift", "-0.1"], ["-corr", "0.05"],
    ["-norealign"], ["-p", "40"], ["-Z", "8", "-B", "8"],
    ["-e", "1e-10"], ["-E", "1e-3"], ["-id", "70"], ["-diff", "3"],
    ["-seq", "3"], ["-aliw", "60"], ["-sc", "0"],
    ["-smin", "100"], ["-maxres", "500"], ["-realign_max", "3"],
    ["-b", "1", "-z", "1"], ["-M", "50"], ["-neff", "3"],
]

def parse_rows(path):
    rows = []
    blocks = []
    with open(path) as f:
        text = f.read()
    for ln in text.splitlines():
        m = re.match(r"\s*\d+ (.{30}) *([\d.]+) +(\S+) +(\S+) +(\S+) +"
                     r"(\S+) +(\d+) +(\d+)-(\d+) +(\d+)-(\d+) *\((\d+)\)", ln)
        if m:
            rows.append((m.group(1).strip(), float(m.group(2)),
                         m.group(3), float(m.group(6)), int(m.group(7)),
                         tuple(int(m.group(k)) for k in range(8, 12))))
    for m in re.finditer(r"Probab=(\S+) +E-value=(\S+) +Score=(\S+) +"
                         r"Aligned_cols=(\d+) +Identities=(\S+) +"
                         r"Similarity=(\S+) +Sum_probs=(\S+)", text):
        blocks.append((float(m.group(1)), float(m.group(3)),
                       int(m.group(4)), m.group(5)))
    return rows, blocks

def compare(a, b):
    ra, ba = parse_rows(a)
    rb, bb = parse_rows(b)
    bad = []
    if len(ra) != len(rb):
        return [f"row count {len(ra)} vs {len(rb)}"]
    for x, y in zip(ra, rb):
        if x[0] != y[0]:
            bad.append(f"order: {x[0]} vs {y[0]}"); continue
        if abs(x[3] - y[3]) > 0.45:            # score drift tolerance
            bad.append(f"{x[0]}: score {x[3]} vs {y[3]}")
        if x[4] != y[4]:
            bad.append(f"{x[0]}: cols {x[4]} vs {y[4]}")
        if x[5] != y[5]:
            bad.append(f"{x[0]}: range {x[5]} vs {y[5]}")
    if len(ba) != len(bb):
        bad.append(f"block count {len(ba)} vs {len(bb)}")
    else:
        for k, (x, y) in enumerate(zip(ba, bb)):
            if abs(x[1] - y[1]) > 0.45:
                bad.append(f"block {k}: score {x[1]} vs {y[1]}")
            if x[2] != y[2]:
                bad.append(f"block {k}: cols {x[2]} vs {y[2]}")
    return bad

def run(tag, flags):
    rf, mf = f"/tmp/cv/ref_{tag}.hhr", f"/tmp/cv/my_{tag}.hhr"
    subprocess.run([REF, "-i", Q, "-d", DB, "-nocontxt", "-v", "0",
                    "-o", rf] + flags, capture_output=True)
    subprocess.run([sys.executable, "-m", "hhsuite_tpu", "hhsearch",
                    "-i", Q, "-d", DB, "-nocontxt", "-v", "0",
                    "-o", mf] + flags, env=ENV, capture_output=True)
    if not (os.path.exists(rf) and os.path.exists(mf)):
        print(f"[{tag}] MISSING OUTPUT {flags}")
        return
    bad = compare(rf, mf)
    status = "OK" if not bad else "DIVERGE"
    print(f"[{tag}] {status} {' '.join(flags)}")
    for b in bad[:4]:
        print("    ", b)

os.makedirs("/tmp/cv", exist_ok=True)
rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
for k in range(n):
    combo = []
    for f in rng.sample(POOL, rng.randint(1, 3)):
        combo += f
    run(f"{k:02d}", combo)
