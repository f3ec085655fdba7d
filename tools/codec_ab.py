"""Interleaved A/B for the r14 multimodal codec vectorization
(fake_wav/ppm/video/png/jpeg byte renders + the PNG encoder filter):
time the multimodal gate rows (noop sink, warm JVM) under whichever
checkout PYTHONPATH points at.

Usage: PYTHONPATH=<checkout> python tools/codec_ab.py <checkout> [reps]
"""

import os
import sys
import time

root = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sys.path.insert(0, root)
os.environ["PYTHONPATH"] = root

import __spark_entry__ as entry  # noqa: E402
from xyzpy_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="codec_ab")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = entry.queries()

ROWS = [
    "multimodal_png",
    "multimodal_jpeg",
    "multimodal_jpeg_lossless",
    "multimodal_meta",
    "video_frames",
    "audio_features",
    "resample_audio",
]

qs["topk_orders"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()

for i in range(reps):
    for name in ROWS:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{name} run{i}: {time.monotonic() - t0:.3f}s", flush=True)
spark.stop()
