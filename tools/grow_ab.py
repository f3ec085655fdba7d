import os, sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = "/root/repo"
from xyzpy_spark.session import get_spark
from xyzpy_spark.cropping import Crop

spark = get_spark(app_name="grow_ab")

def kernel(a, b):
    return a * 100 + b, a - b

def run(conc):
    os.environ["XYZPY_GROW_CONCURRENCY"] = str(conc)
    workdir = tempfile.mkdtemp(prefix="grow_ab_")
    try:
        t0 = time.monotonic()
        crop = Crop("contract", workdir, spark=spark)
        crop.sow_combos(kernel, {"a": [1, 2, 3, 4, 5], "b": [10, 20, 30]},
                        var_names=["v", "w"], num_batches=4)
        crop.grow()
        rows = sorted(map(tuple, crop.reap().collect()))
        return time.monotonic() - t0, rows
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

_, ra = run(1)
_, rb = run(2)
print("identical =", ra == rb, f"({len(ra)} rows)")
times = {"A": [], "B": []}
for i in range(3):
    for kind, c in (("A", 1), ("B", 2)):
        sec, _ = run(c)
        times[kind].append(sec)
        print(f"{kind}(conc={c}) run {i}: {sec:.2f}s", flush=True)
for kind in ("A", "B"):
    ts = sorted(times[kind])
    print(f"{kind}: median {ts[len(ts)//2]:.2f}s  all " + " ".join(f"{t:.2f}" for t in times[kind]))
