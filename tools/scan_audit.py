import os, re, sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from xyzpy_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

def formatted_plan(df):
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

spark = get_spark(app_name="audit2")
queries = entrymod.queries()
names = sys.argv[1:]
print(f"{'query':30s} loc dup imr py")
for name in names:
    try:
        df = queries[name](spark, SF_DIR)
        plan = formatted_plan(df)
    except Exception as e:
        print(f"{name:30s} ERR {type(e).__name__}")
        continue
    locs = re.findall(r"Location: \S+ \[([^\]]*)\]", plan)
    imr = len(re.findall(r"InMemoryRelation", plan))
    py = len(set(re.findall(r"\((\d+)\) (?:ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)))
    dup = len(locs) - len(set(locs))
    print(f"{name:30s} {len(locs):3d} {dup:3d} {imr:3d} {py:2d}", flush=True)
