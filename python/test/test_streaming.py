"""Round-trips for the client's streaming surfaces: the native
structured-streaming sink (exactly-once epochs through repeated
subprocess drains) and the change-data-feed consumer (puts AND deletes,
resolved per key to the table's own reads).
"""

import glob
import os
import shutil
import tempfile

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _find_jar():
    jars = sorted(glob.glob(os.path.join(REPO, "target", "scala-*", "sleeperspark_*.jar")))
    return jars[-1] if jars else None


def _find_spark_submit():
    home = os.environ.get("SPARK_HOME", "/opt/spark")
    p = os.path.join(home, "bin", "spark-submit")
    return p if os.path.exists(p) else shutil.which("spark-submit")


JAR = _find_jar()
SPARK_SUBMIT = _find_spark_submit()

pytestmark = pytest.mark.skipif(
    JAR is None or SPARK_SUBMIT is None,
    reason="needs `sbt package` output and a Spark distribution")


@pytest.fixture(scope="module")
def client():
    import sys
    sys.path.insert(0, os.path.join(REPO, "python"))
    from graft_client import GraftClient

    table_dir = tempfile.mkdtemp(prefix="graft-pystream-")
    tracker_dir = tempfile.mkdtemp(prefix="graft-pystream-tr-")
    c = GraftClient(table_dir, jar=JAR, spark_submit=SPARK_SUBMIT,
                    master="local[4]", tracker_dir=tracker_dir)
    # last-write-wins so sink epochs resolve in drain order
    c.seed_demo_table(rows=20, split=10, agg_config="last(v)")
    yield c
    shutil.rmtree(table_dir, ignore_errors=True)
    shutil.rmtree(tracker_dir, ignore_errors=True)


def _parquet(rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tempfile.mkdtemp(prefix="graft-pystream-batch-")
    path = os.path.join(d, "batch.parquet")
    pq.write_table(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.int64())}), path)
    return path


def test_streaming_sink_exactly_once(client):
    from graft_client import StreamingSinkWriter

    w = StreamingSinkWriter(client)
    w.add([_parquet([(100, 1), (101, 1)])])
    st = w.drain()
    assert st["state"] == "OK", st

    res = client.exact_key_query([{"k": 100}], query_id="py-sink-1")
    assert res.completed and res.row_count == 1
    assert res.rows()[0]["v"] == 1

    # a second epoch updates the LWW value; draining with nothing new is
    # a no-op (no duplicate generation)
    w.add([_parquet([(100, 2)])])
    assert w.drain()["state"] == "OK"
    assert w.drain()["state"] == "OK"  # empty drain
    res2 = client.exact_key_query([{"k": 100}], query_id="py-sink-2")
    assert res2.completed and res2.row_count == 1
    assert res2.rows()[0]["v"] == 2, "second epoch resolves above the first"


def test_change_feed_resolves_to_table_reads(client):
    from graft_client import AdminClient, ChangeFeedReader, DeleteJob

    feed = ChangeFeedReader(client)
    st = feed.drain()
    assert st["state"] == "OK", st
    base = feed.resolve(["k"])
    assert (5,) in base, "initial drain is the table snapshot"

    # window 2: an update and a delete, then drain INCREMENTALLY
    from graft_client import StreamingSinkWriter
    w = StreamingSinkWriter(client)
    w.add([_parquet([(5, 555)])])
    assert w.drain()["state"] == "OK"
    AdminClient(client).delete_keys(DeleteJob(keys=[6], job_id="py-feed-del"))

    st2 = feed.drain()
    assert st2["state"] == "OK", st2
    assert st2["endVersion"] > st["endVersion"]

    rows = feed.rows()
    assert any(r["_op"] == "delete" and r["k"] == 6 for r in rows), \
        "the feed delivers the delete"
    resolved = feed.resolve(["k"])
    assert resolved[(5,)]["v"] == 555, "update resolves above the snapshot"
    assert (6,) not in resolved, "deleted key resolves away"

    # the resolved feed matches the table's own reads
    res = client.exact_key_query([{"k": 5}, {"k": 6}], query_id="py-feed-q")
    assert res.completed and res.row_count == 1
    assert res.rows()[0]["v"] == 555
