import numpy as np
import pytest

from conftest import fn3_fba, foo3_scalar
from xyzpy_spark.cropping import Crop, load_crops
from xyzpy_spark.runner import combo_runner_to_df

COMBOS = {"a": [1, 2, 3], "b": [10, 20, 30], "c": [100, 200, 300, 400]}


def test_sow_grow_reap_equals_direct(spark, tmp_path):
    """Reference: sow/grow/reap == direct combo_runner result
    (tests/test_gen/test_cropping.py:104-144)."""
    crop = Crop("t1", str(tmp_path), spark=spark)
    nb = crop.sow_combos(foo3_scalar, COMBOS, var_names="x", batchsize=5)
    assert nb == -(-36 // 5)  # ceil(36/5) = 8 batches
    assert crop.missing_batches() == set(range(nb))
    crop.grow()
    assert crop.is_ready_to_reap()
    reaped = crop.reap()
    direct = combo_runner_to_df(spark, foo3_scalar, COMBOS, var_names="x")
    got = sorted(tuple(r) for r in reaped.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


def test_partial_grow_and_progress(spark, tmp_path):
    crop = Crop("t2", str(tmp_path), spark=spark)
    nb = crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=6)
    crop.grow([0, 2])
    assert crop.grown_batches() == {0, 2}
    assert crop.missing_batches() == {1, 3, 4, 5}
    assert crop.progress() == pytest.approx(2 / 6)
    with pytest.raises(RuntimeError, match="not ready"):
        crop.reap()


def test_reap_incomplete_null_fill(spark, tmp_path):
    """allow_incomplete fills ungrown points with nulls (reference
    tests/test_gen/test_cropping.py:265-281)."""
    crop = Crop("t3", str(tmp_path), spark=spark)
    crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=6)
    crop.grow([0, 1, 2])
    df = crop.reap(allow_incomplete=True)
    rows = df.collect()
    assert len(rows) == 36
    n_null = sum(1 for r in rows if r["x"] is None)
    assert n_null == 18  # 3 of 6 batches of 6 points each


def test_grow_from_fresh_session_object(spark, tmp_path):
    """The decoupling contract: a Crop reloaded purely from disk can
    grow and reap (reference crop-state reload,
    tests/test_gen/test_cropping.py:316-348)."""
    crop = Crop("t4", str(tmp_path), spark=spark)
    crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=4)
    # fresh object, no state beyond the directory
    crop2 = Crop("t4", str(tmp_path), spark=spark)
    assert crop2.exists()
    assert crop2.num_batches == 4
    crop2.grow()
    assert crop2.reap().count() == 36


def test_non_dividing_batch_counts(spark, tmp_path):
    """num_batches not dividing n (reference
    tests/test_gen/test_cropping.py:214-229)."""
    crop = Crop("t5", str(tmp_path), spark=spark)
    crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=7)
    sizes = crop.expected_batch_sizes()
    assert sum(sizes.values()) == 36
    assert max(sizes.values()) - min(sizes.values()) <= 1
    crop.grow()
    assert crop.reap().count() == 36


def test_internal_dims_through_crop(spark, tmp_path):
    crop = Crop("t6", str(tmp_path), spark=spark)
    crop.sow_combos(
        fn3_fba,
        {"a": [1, 2], "b": [3, 4]},
        var_names=["sum", "even", "arr"],
        var_dims={"arr": ["time"]},
        var_coords={"time": np.linspace(0, 1, 3)},
        constants={"c": 100},
        num_batches=2,
    )
    crop.grow()
    rows = crop.reap().collect()
    assert len(rows) == 12
    for r in rows:
        assert r["arr"] == pytest.approx(r["a"] * (r["b"] * r["time"] + 100))


def test_check_bad_detects_truncation(spark, tmp_path):
    import os
    import shutil

    crop = Crop("t7", str(tmp_path), spark=spark)
    crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=4)
    crop.grow()
    assert crop.check_bad() == []
    # corrupt batch 1: replace with batch 0's (wrong-size) data
    b0 = os.path.join(crop.results_path, "batch=0")
    b1 = os.path.join(crop.results_path, "batch=1")
    shutil.rmtree(b1)
    shutil.copytree(b0, b1)
    # same size (36/4=9 each) -> not detected by count; instead truncate
    # by removing batch 2 files partially is fs-dependent; easier: sow a
    # non-dividing crop where sizes differ
    crop2 = Crop("t7b", str(tmp_path), spark=spark)
    crop2.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=7)
    crop2.grow()
    s = crop2.expected_batch_sizes()
    small = min(s, key=s.get)
    big = max(s, key=s.get)
    shutil.rmtree(os.path.join(crop2.results_path, f"batch={big}"))
    shutil.copytree(
        os.path.join(crop2.results_path, f"batch={small}"),
        os.path.join(crop2.results_path, f"batch={big}"),
    )
    bad = crop2.check_bad(delete=True)
    assert bad == [big]
    assert big in crop2.missing_batches()


def test_mixed_cases_and_combos(spark, tmp_path):
    """Reference tests/test_gen/test_cropping.py:437-459."""

    def f(a, b, c, d, e):
        return a + b + c + d + e

    crop = Crop("t8", str(tmp_path), spark=spark)
    crop.sow_combos(
        f,
        {"b": [5, 6], "d": [7, 8]},
        cases=[{"a": 1, "c": 3}, {"a": 2, "c": 4}],
        var_names="x",
        constants={"e": 9},
        num_batches=3,
    )
    crop.grow()
    rows = crop.reap().collect()
    assert len(rows) == 8
    for r in rows:
        assert r["x"] == r["a"] + r["b"] + r["c"] + r["d"] + 9


def test_load_crops(spark, tmp_path):
    Crop("c1", str(tmp_path), spark=spark).sow_combos(
        foo3_scalar, COMBOS, var_names="x", num_batches=2
    )
    Crop("c2", str(tmp_path), spark=spark).sow_combos(
        foo3_scalar, COMBOS, var_names="x", num_batches=2
    )
    found = load_crops(str(tmp_path), spark=spark)
    assert set(found) == {"c1", "c2"}


def test_reap_harvest_into_store(spark, tmp_path):
    from xyzpy_spark.farming import Harvester, Runner

    runner = Runner(foo3_scalar, var_names="x", spark=spark)
    h = Harvester(runner, str(tmp_path / "store.parquet"))
    crop = Crop("t9", str(tmp_path), spark=spark)
    crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=3)
    crop.grow()
    merged = crop.reap_harvest(h, ["a", "b", "c"])
    assert merged.count() == 36


def test_resow_clears_stale_results(spark, tmp_path):
    """Re-sowing a crop must clear results/ — otherwise the old
    sweep's values reap as if they were the new one's (review)."""
    from xyzpy_spark.cropping import Crop

    crop = Crop("resow", str(tmp_path), spark=spark)
    crop.sow_combos(lambda a: a + 1, {"a": [1, 2]}, var_names="y")
    crop.grow()
    assert crop.is_ready_to_reap()
    crop.sow_combos(lambda a: a * 10, {"a": [1, 2]}, var_names="y")
    assert not crop.is_ready_to_reap()
    crop.grow()
    rows = {r["a"]: r["y"] for r in crop.reap().collect()}
    assert rows == {1: 10, 2: 20}


def test_reap_incomplete_with_zero_grown(spark, tmp_path):
    """allow_incomplete before any grow: the documented null-filled
    grid, not PATH_NOT_FOUND (review)."""
    from xyzpy_spark.cropping import Crop

    crop = Crop("zero", str(tmp_path), spark=spark)
    crop.sow_combos(lambda a: a + 1, {"a": [1, 2, 3]}, var_names="y")
    rows = {r["a"]: r["y"] for r in crop.reap(allow_incomplete=True).collect()}
    assert rows == {1: None, 2: None, 3: None}


def test_resow_identical_keeps_grown_batches(spark, tmp_path):
    """Re-sowing the SAME grid+kernel+batching is a no-op: grown
    batches stay valid (stable _loc join) and must not be destroyed
    (review r3)."""
    crop = Crop("resow_same", str(tmp_path), spark=spark)
    nb = crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=4)
    crop.grow([0, 1])
    assert crop.grown_batches() == {0, 1}
    nb2 = crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=4)
    assert nb2 == nb
    assert crop.grown_batches() == {0, 1}  # survived the re-sow
    crop.grow()  # top up the rest
    direct = combo_runner_to_df(spark, foo3_scalar, COMBOS, var_names="x")
    got = sorted(tuple(r) for r in crop.reap().collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


def test_resow_changed_var_spec_clears(spark, tmp_path):
    """Changing the OUTPUT spec (var_names) on an otherwise identical
    re-sow must not early-return: reap would decode results with the
    stale single-variable spec (review r3)."""
    crop = Crop("resow_spec", str(tmp_path), spark=spark)
    crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=4)
    crop.grow([0])
    assert crop.grown_batches() == {0}
    crop.sow_combos(foo3_scalar, COMBOS, var_names="renamed", num_batches=4)
    assert crop.grown_batches() == set()  # stale results cleared
    crop.grow()
    assert "renamed" in crop.reap().columns


def test_resow_changed_batching_clears(spark, tmp_path):
    """Changing num_batches re-partitions the grid, so grown batch
    files no longer align — the crop must reset."""
    crop = Crop("resow_nb", str(tmp_path), spark=spark)
    crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=4)
    crop.grow([0])
    crop.sow_combos(foo3_scalar, COMBOS, var_names="x", num_batches=6)
    assert crop.grown_batches() == set()
    assert crop.num_batches == 6


def test_reap_harvest_into_partitioned_store(spark, tmp_path):
    """The sow/grow/reap pipeline composes with the r9 partitioned
    store: reap_harvest into a partition_by store lands dim=value
    dirs, and a second crop's reap touches only ITS coordinates'
    partitions (the O(touched) publish through the staged-execution
    path)."""
    import os

    from xyzpy_spark.farming import Harvester, Runner

    runner = Runner(foo3_scalar, var_names="x", spark=spark)
    store = tmp_path / "pstore.parquet"
    h = Harvester(runner, str(store), partition_by="a")
    c1 = Crop("p1", str(tmp_path), spark=spark)
    c1.sow_combos(
        foo3_scalar, {"a": [1, 2], "b": [10], "c": [100, 200]},
        var_names="x", num_batches=2,
    )
    c1.grow()
    assert c1.reap_harvest(h, ["a", "b", "c"]).count() == 4
    assert (store / "a=1").is_dir() and (store / "a=2").is_dir()

    def snap(v):
        return sorted(
            (f, (store / f"a={v}" / f).stat().st_mtime_ns)
            for f in os.listdir(store / f"a={v}")
            if not f.startswith(".")
        )

    before = {1: snap(1), 2: snap(2)}
    c2 = Crop("p2", str(tmp_path), spark=spark)
    c2.sow_combos(
        foo3_scalar, {"a": [3], "b": [10], "c": [100, 200]},
        var_names="x", num_batches=1,
    )
    c2.grow()
    assert c2.reap_harvest(h, ["a", "b", "c"]).count() == 6
    assert (store / "a=3").is_dir()
    assert {1: snap(1), 2: snap(2)} == before
