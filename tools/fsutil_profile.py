"""Profile fsutil driver round-trips in the harvest gate queries (r14
verdict ask #3): count every fsutil call and its wall time during
q_harvest_partitioned / q_harvest_partitioned_2d, so the FS-metadata
share of the row is a measured number, not a guess (guide §1.2).

Usage: python tools/fsutil_profile.py [sf_dir]
"""

import collections
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from xyzpy_spark import fsutil  # noqa: E402
from xyzpy_spark.session import get_spark  # noqa: E402

COUNTS = collections.Counter()
WALL = collections.Counter()


def _wrap(name):
    fn = getattr(fsutil, name)

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.perf_counter() - t0
            COUNTS[name] += 1
            WALL[name] += dt

    return wrapped


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="fsutil_profile")
    # warm
    entry.queries()["topk_orders"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    names = [
        "exists", "is_dir", "listdir", "glob_paths", "mkdirs",
        "create_new", "delete", "rename", "replace", "read_bytes",
        "write_bytes", "read_text", "read_text_or_none", "write_text",
        "content_size",
    ]
    originals = {n: getattr(fsutil, n) for n in names}
    # patch both the module and farming's imported reference
    import xyzpy_spark.farming as farming

    for n in names:
        setattr(fsutil, n, _wrap(n))
    # farming does `from . import fsutil` so module attr patch covers it
    assert farming.fsutil is fsutil

    for qname in ("harvest_partitioned", "harvest_partitioned_2d"):
        COUNTS.clear()
        WALL.clear()
        t0 = time.perf_counter()
        entry.queries()[qname](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        total = time.perf_counter() - t0
        print(f"== {qname}: total {total:.3f}s")
        fs_total = sum(WALL.values())
        n_total = sum(COUNTS.values())
        print(f"   fsutil: {n_total} calls, {fs_total:.3f}s "
              f"({100*fs_total/total:.1f}% of row)")
        for n, c in COUNTS.most_common():
            print(f"   {n:14s} {c:4d} calls {WALL[n]:.3f}s")

    for n, fn in originals.items():
        setattr(fsutil, n, fn)
    spark.stop()


if __name__ == "__main__":
    main()
