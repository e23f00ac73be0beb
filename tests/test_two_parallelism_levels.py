"""North-rule evidence in pytest: the same job at N and 4N parallelism
(local[2] vs local[8] — the sandbox stand-in for two cluster sizes)
produces identical results. Each level runs in its own process because a
Spark master is fixed per JVM."""

import json
import subprocess
import sys

JOB = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from geobuf_cpp_spark.session import get_spark
from geobuf_cpp_spark.sources.pages import pages_dataframe, generate_admin_polygons
from geobuf_cpp_spark.functions.udfs import extract_encode_features
from geobuf_cpp_spark.operators.pip_join import pip_join
import pyspark.sql.functions as F

cpus = int(sys.argv[1])
spark = get_spark(f"lvl{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = pages_dataframe(spark, 1500, partitions=8)
enc = extract_encode_features(pages)
joined = pip_join(enc.select("url", "feature_idx", "lon", "lat"), generate_admin_polygons(), res=8)
rows = sorted(
    (r["url"], int(r["feature_idx"]), int(r["admin_id"]))
    for r in joined.select("url", "feature_idx", "admin_id").collect()
)
total_bytes = enc.agg(F.sum(F.octet_length("geobuf"))).collect()[0][0]
print("RESULT " + json.dumps({"n": len(rows), "head": rows[:5], "tail": rows[-5:],
                               "bytes": int(total_bytes)}))
spark.stop()
"""


def _run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", JOB, str(cpus)],
        capture_output=True, text=True, timeout=400, cwd="/root/repo",
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, out.stderr[-2000:]
    return json.loads(lines[-1][len("RESULT "):])


def test_same_results_at_n_and_4n():
    a = _run(2)
    b = _run(8)
    assert a == b
    assert a["n"] > 100  # non-trivial join


JOB_SHUFFLE = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from geobuf_cpp_spark.session import get_spark

cpus = int(sys.argv[1])
spark = get_spark(f"shuf{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
from geobuf_cpp_spark.operators.dedup import exact_dedup
from geobuf_cpp_spark.operators.sketches import ams_sketch, count_min_sketch

kept = exact_dedup(docs).count()
cms = sorted((int(r["sketch_row"]), int(r["bucket"]), int(r["cnt"]))
             for r in count_min_sketch(docs).collect())
ams = sorted((int(r["r"]), int(r["counter"])) for r in ams_sketch(docs).collect())
print("RESULT " + json.dumps({"kept": kept, "cms_head": cms[:5],
                               "cms_n": len(cms), "ams": ams}))
spark.stop()
"""


def test_shuffle_operators_same_at_n_and_4n():
    """The dedup + sketch shuffle paths (hash agg, distinct, global
    agg) are parallelism-invariant: identical outputs at local[2] and
    local[8], the same two-cluster-size evidence the pipeline test
    gives the extract->PIP path."""
    out2 = subprocess.run(
        [sys.executable, "-c", JOB_SHUFFLE, "2"],
        capture_output=True, text=True, timeout=400, cwd="/root/repo")
    out8 = subprocess.run(
        [sys.executable, "-c", JOB_SHUFFLE, "8"],
        capture_output=True, text=True, timeout=400, cwd="/root/repo")
    rs = []
    for out in (out2, out8):
        lines = [l for l in out.stdout.splitlines()
                 if l.startswith("RESULT ")]
        assert lines, out.stderr[-2000:]
        rs.append(json.loads(lines[-1][len("RESULT "):]))
    assert rs[0] == rs[1]
    assert rs[0]["kept"] > 0 and rs[0]["cms_n"] > 100


JOB_SPATIAL = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from geobuf_cpp_spark.session import get_spark
import pyspark.sql.functions as F

cpus = int(sys.argv[1])
spark = get_spark(f"sp{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
events = spark.read.parquet(f"{sf}/events.parquet")
pings = events.selectExpr("event_id", "user_id", "ts",
                          "(event_id * 7919) % 36000 AS ix",
                          "(event_id * 9973) % 17000 AS iy")
docs = spark.read.parquet(f"{sf}/documents.parquet")
orders = spark.read.parquet(f"{sf}/orders.parquet")
pts = orders.selectExpr("o_orderkey AS point_id",
                        "(o_orderkey * 7919) % 36000 AS ix",
                        "(o_orderkey * 9973) % 17000 AS iy")

from geobuf_cpp_spark.operators.colocation import colocation_pairs
from geobuf_cpp_spark.operators.sketches import heavy_hitters
from geobuf_cpp_spark.operators.tiles import adaptive_quadtree

co = sorted((int(r["user_a"]), int(r["user_b"]), int(r["n_contacts"]))
            for r in colocation_pairs(pings, 1000, 7200).collect())
hh = sorted((r["tok"], int(r["n"])) for r in heavy_hitters(docs, 31).collect())
qt = sorted((int(r["z"]), int(r["cx"]), int(r["cy"]), int(r["n_points"]))
            for r in adaptive_quadtree(pts, 64, 8).collect())
print("RESULT " + json.dumps({"co_n": len(co), "co_head": co[:5],
                               "hh": hh[:10], "hh_n": len(hh),
                               "qt_n": len(qt), "qt_head": qt[:5],
                               "qt_sum": sum(x[3] for x in qt)}))
spark.stop()
"""


def test_spatial_and_sketch_round5_ops_same_at_n_and_4n():
    """Session-3 shuffle paths are parallelism-invariant: the space-time
    blocked co-location join, the two-pass Misra-Gries heavy hitters
    (whose PASS-1 candidate summaries are partition-dependent by design
    — the exact recount must erase that), and the quadtree leaf
    decomposition all produce identical results at local[2] and
    local[8]."""
    rs = []
    for cpus in ("2", "8"):
        out = subprocess.run(
            [sys.executable, "-c", JOB_SPATIAL, cpus],
            capture_output=True, text=True, timeout=400, cwd="/root/repo")
        lines = [l for l in out.stdout.splitlines()
                 if l.startswith("RESULT ")]
        assert lines, out.stderr[-2000:]
        rs.append(json.loads(lines[-1][len("RESULT "):]))
    assert rs[0] == rs[1]
    assert rs[0]["hh_n"] > 10 and rs[0]["qt_n"] > 10
    assert rs[0]["qt_sum"] == 1500   # leaves partition the 1500 points
