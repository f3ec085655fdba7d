"""Concurrent-grower durability: two independent Spark sessions (real
subprocesses, separate JVMs) grow disjoint batch sets of the SAME crop
at the same time — the reference Crop's core use case (many cluster
jobs growing one sweep).  Atomic per-batch writes (temp + rename) must
never collide and reap must see every batch."""

import os
import subprocess
import sys
import textwrap

from xyzpy_spark.cropping import Crop
from xyzpy_spark.runner import combo_runner_to_df

COMBOS = {"a": [1, 2, 3, 4], "b": [10, 20, 30]}


def _kernel(a, b):
    return a * 100 + b


_GROWER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {tests!r})
    from xyzpy_spark.session import get_spark
    from xyzpy_spark.cropping import Crop

    spark = get_spark(
        app_name="grower_{tag}", master="local[2]", shuffle_partitions=2
    )
    crop = Crop({name!r}, {parent!r}, spark=spark)
    crop.grow(batch_ids={batches!r})
    spark.stop()
    """
)


def test_two_subprocess_growers_disjoint_batches(spark, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tests = os.path.join(repo, "tests")
    crop = Crop("conc", str(tmp_path), spark=spark)
    nb = crop.sow_combos(_kernel, COMBOS, var_names="y", num_batches=4)
    assert nb == 4

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo, tests, env.get("PYTHONPATH", "")]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _GROWER.format(
                repo=repo, tests=tests, tag=tag, name="conc",
                parent=str(tmp_path), batches=batches,
            )],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for tag, batches in (("a", [0, 1]), ("b", [2, 3]))
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode(errors="replace")[-3000:]

    # both growers' batches landed; no temp dirs left behind
    assert crop.grown_batches() == {0, 1, 2, 3}
    leftovers = [
        d for d in os.listdir(crop.results_path) if d.startswith("_tmp_")
    ]
    assert leftovers == []
    assert crop.check_bad() == []

    reaped = crop.reap()
    direct = combo_runner_to_df(spark, _kernel, COMBOS, var_names="y")
    got = sorted(tuple(r) for r in reaped.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


def test_reap_wait_blocks_until_grown(spark, tmp_path):
    """reap(wait=True) must poll until decoupled growers finish
    (reference Reaper wait semantics, gen/cropping.py:1513-1524):
    batch 1 is grown from a second thread AFTER reap starts
    blocking."""
    import threading
    import time as _time

    crop = Crop("waity", str(tmp_path), spark=spark)
    crop.sow_combos(_kernel, COMBOS, var_names="y", num_batches=2)
    crop.grow(batch_ids=[0])

    def late_grower():
        _time.sleep(1.0)
        crop.grow(batch_ids=[1])

    t = threading.Thread(target=late_grower)
    t0 = _time.monotonic()
    t.start()
    try:
        reaped = crop.reap(wait=True, timeout=120)
        waited = _time.monotonic() - t0
    finally:
        t.join()
    # it actually blocked for the late batch rather than failing fast
    assert waited >= 1.0
    direct = combo_runner_to_df(spark, _kernel, COMBOS, var_names="y")
    assert sorted(tuple(r) for r in reaped.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )


def test_reap_wait_timeout_names_missing_batches(spark, tmp_path):
    import pytest

    crop = Crop("slowpoke", str(tmp_path), spark=spark)
    crop.sow_combos(_kernel, COMBOS, var_names="y", num_batches=2)
    crop.grow(batch_ids=[0])
    with pytest.raises(TimeoutError, match=r"slowpoke.*\[1\]"):
        crop.reap(wait=True, timeout=0.5)
