import os, random, re, subprocess, sys
REF = "/tmp/refbuild/src"
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
Q = "/root/repo/tests/fixtures/query.a3m"

def norm(path):
    out = []
    for ln in open(path):
        if ln.startswith(("DATE", "COM ", "COMMAND")):
            continue
        out.append(ln)
    return "".join(out)

def sub_msa(rng, path, n):
    """Random subset of n sequences (query first)."""
    entries = []
    name = None; seq = []
    for ln in open(path):
        if ln.startswith(">"):
            if name: entries.append((name, "".join(seq)))
            name = ln; seq = []
        elif name is not None:
            seq.append(ln)
    entries.append((name, "".join(seq)))
    rest = entries[1:]; rng.shuffle(rest)
    keep = [entries[0]] + rest[: n - 1]
    return "".join(n_ + s for n_, s in keep)

rng = random.Random(int(sys.argv[1]))
os.makedirs("/tmp/cvt", exist_ok=True)
bad = 0
for k in range(int(sys.argv[2])):
    msa = sub_msa(rng, Q, rng.randint(3, 40))
    inp = f"/tmp/cvt/in{k}.a3m"
    open(inp, "w").write(msa)
    tool = rng.choice(["hhmake", "hhfilter", "hhconsensus", "cstranslate"])
    if tool == "hhmake":
        args = ["-i", inp, "-v", "0", "-nocontxt"]
        if rng.random() < 0.5: args += ["-id", str(rng.choice([50, 70, 90]))]
        if rng.random() < 0.3: args += ["-diff", str(rng.choice([3, 10]))]
        ro, mo = f"/tmp/cvt/r{k}.hhm", f"/tmp/cvt/m{k}.hhm"
    elif tool == "hhfilter":
        args = ["-i", inp, "-v", "0",
                "-id", str(rng.choice([50, 70, 90])),
                "-diff", str(rng.choice([0, 5, 100])),
                "-cov", str(rng.choice([0, 30]))]
        ro, mo = f"/tmp/cvt/r{k}.a3m", f"/tmp/cvt/m{k}.a3m"
    elif tool == "hhconsensus":
        args = ["-i", inp, "-v", "0", "-nocontxt"]
        ro, mo = f"/tmp/cvt/r{k}.a3m", f"/tmp/cvt/m{k}.a3m"
        args_ref = args + ["-oa3m", ro]; args_my = args + ["-oa3m", mo]
    else:
        args = ["-i", inp, "-x", "0.3", "-c", "4",
                "-D", "/root/repo/hhsuite_tpu/data/cs219.lib"]
        ro, mo = f"/tmp/cvt/r{k}.seq", f"/tmp/cvt/m{k}.seq"
    if tool == "hhconsensus":
        subprocess.run([f"{REF}/{tool}"] + args_ref, capture_output=True)
        subprocess.run([sys.executable, "-m", "hhsuite_tpu", tool]
                       + args_my, env=ENV, capture_output=True)
    elif tool == "cstranslate":
        subprocess.run([f"{REF}/{tool}"] + args + ["-o", ro],
                       capture_output=True)
        subprocess.run([sys.executable, "-m", "hhsuite_tpu", tool]
                       + args + ["-o", mo], env=ENV, capture_output=True)
    else:
        subprocess.run([f"{REF}/{tool}"] + args + ["-o", ro],
                       capture_output=True)
        subprocess.run([sys.executable, "-m", "hhsuite_tpu", tool]
                       + args + ["-o", mo], env=ENV, capture_output=True)
    if not (os.path.exists(ro) and os.path.exists(mo)):
        print(f"[{k}] {tool} MISSING ({' '.join(args)})"); bad += 1; continue
    if tool == "cstranslate":
        same = open(ro, "rb").read() == open(mo, "rb").read()
    else:
        same = norm(ro) == norm(mo)
    if not same:
        print(f"[{k}] {tool} DIVERGE ({' '.join(args)})"); bad += 1
print(f"{int(sys.argv[2]) - bad}/{sys.argv[2]} identical")
