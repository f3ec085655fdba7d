"""GPU resource-profile smoke (round-4 verdict stretch item #8).

COVERAGE.md §2.4 claims the reference's GPU-aware executors (E3/E4,
Ray `num_gpus=`) map to Spark's `spark.task.resource.gpu.amount`.
These tests exercise exactly what that claim covers:

- ALWAYS: the introspection path a GPU task would use
  (`TaskContext.resources()`) works inside the sweep harness and is
  empty-safe in local mode — so `resources=`-style code that reads it
  degrades gracefully on CPU-only boxes.
- ENV-GATED (`XYZPY_GPU_SMOKE=1` + an `nvidia-smi` on PATH): a
  standalone-mode session with a fractional
  `spark.task.resource.gpu.amount` actually hands each task a GPU
  address.  Local mode does not schedule custom resources (Spark
  upstream limitation), so the gated test is the only honest full
  check; CI without GPUs runs the introspection half only.

What is NOT claimed: no operator in this package launches GPU
kernels.  The claim is scheduling plumbing — a user's Pandas UDF can
read its assigned GPU from `TaskContext.resources()['gpu']` exactly
as a Ray `num_gpus=0.25` task would.
"""

import os
import shutil

import pytest


def test_task_context_resources_empty_safe_local(spark):
    """The resources() read path a GPU task uses must work (and be
    empty) under local[*] — code keyed on it degrades to CPU."""
    from pyspark import TaskContext

    def probe(it):
        ctx = TaskContext.get()
        res = ctx.resources()
        # local mode schedules no custom resources: the dict is empty,
        # and reading it must not raise
        yield (int("gpu" in res),)

    rows = (
        spark.range(4)
        .repartition(2)
        .rdd.mapPartitions(probe)
        .collect()
    )
    assert rows and all(r[0] == 0 for r in rows)


@pytest.mark.skipif(
    os.environ.get("XYZPY_GPU_SMOKE") != "1"
    or shutil.which("nvidia-smi") is None,
    reason="needs XYZPY_GPU_SMOKE=1 and an nvidia-smi on PATH "
    "(fractional GPU scheduling needs a real accelerator + "
    "standalone master; local mode ignores custom resources)",
)
def test_fractional_gpu_resource_profile(tmp_path):
    """With a GPU present: a discovery script + fractional task
    amount must hand every task a GPU address via resources()."""
    import json
    import subprocess

    from pyspark import TaskContext
    from pyspark.sql import SparkSession

    uuids = subprocess.run(
        ["nvidia-smi", "--query-gpu=uuid", "--format=csv,noheader"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    disc = tmp_path / "gpu_discovery.sh"
    disc.write_text(
        "#!/bin/sh\necho '"
        + json.dumps({"name": "gpu", "addresses": uuids})
        + "'\n"
    )
    disc.chmod(0o755)
    spark = (
        SparkSession.builder.appName("xyzpy_gpu_smoke")
        .master("local-cluster[1,2,2048]")
        .config("spark.executor.resource.gpu.amount", "1")
        .config("spark.task.resource.gpu.amount", "0.5")
        .config(
            "spark.executor.resource.gpu.discoveryScript", str(disc)
        )
        .getOrCreate()
    )
    try:

        def probe(it):
            res = TaskContext.get().resources()
            yield (res["gpu"].addresses[0],)

        rows = (
            spark.sparkContext.range(0, 4, numSlices=4)
            .mapPartitions(probe)
            .collect()
        )
        assert rows and all(a for (a,) in rows)
    finally:
        spark.stop()
