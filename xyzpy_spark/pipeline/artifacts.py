"""Shared persistence discipline for trained-model / index artifacts.

Every save_* in the pipeline (LM tables, langid classifiers, PQ
codebooks, IVF centroids) follows one overwrite protocol: a commit
MARKER directory is written LAST and deleted FIRST on overwrite, so a
crash mid-rewrite leaves a load-visibly-broken artifact (no marker)
instead of silently pairing a stale marker with new data.
"""

from __future__ import annotations


def delete_marker_first(spark, path: str, marker_dir: str) -> None:
    """Delete the commit-marker directory of an artifact at ``path``
    before rewriting its tables.  Portable Hadoop FS delete
    (local/S3/HDFS alike)."""
    import posixpath

    jvm = spark._jvm
    marker = jvm.org.apache.hadoop.fs.Path(
        posixpath.join(path, marker_dir)
    )
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(marker):
        fs.delete(marker, True)
