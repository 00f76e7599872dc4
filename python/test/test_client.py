"""Round-trip test for the thin Python client: seed a temp table with
spark-submit, run an exact-key and a range query through
graft.query.QueryRunner, and read back parquet + status.

Requires the packaged jar (`sbt package`) and a Spark distribution
(SPARK_HOME or /opt/spark). Skips cleanly when either is missing.
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

    table_dir = tempfile.mkdtemp(prefix="graft-pytable-")
    tracker_dir = tempfile.mkdtemp(prefix="graft-pytracker-")
    c = GraftClient(table_dir, jar=JAR, spark_submit=SPARK_SUBMIT,
                    master="local[4]", tracker_dir=tracker_dir)
    c.seed_demo_table(rows=50, split=25)
    yield c
    shutil.rmtree(table_dir, ignore_errors=True)
    shutil.rmtree(tracker_dir, ignore_errors=True)


def test_exact_key_query_round_trip(client):
    res = client.exact_key_query([{"k": 7}, {"k": 33}], query_id="py-keys")
    assert res.completed, res
    assert res.row_count == 2
    rows = {(r["k"], r["v"]) for r in res.rows()}
    assert rows == {(7, 70), (33, 330)}
    # the durable tracker saw the full lifecycle from this process
    status = client.query_status("py-keys")
    assert status is not None and status["state"] == "COMPLETED"
    assert status["rowCount"] == 2


def test_range_query_with_projection(client):
    from graft_client import Range, Region

    res = client.range_key_query(
        [Region({"k": Range(min=10, max=20)})],  # [10, 20)
        query_id="py-range", requested_value_fields=["v"])
    assert res.completed, res
    assert res.row_count == 10
    rows = res.rows()
    assert {r["k"] for r in rows} == set(range(10, 20))
    assert set(rows[0].keys()) == {"k", "v"}  # keys always ride along


def test_failed_query_surfaces_error(client):
    from graft_client import GraftClient, Query

    # a broken query-time transform class fails with status, not silence
    q = Query(query_id="py-bad", keys=[{"k": 1}])
    d = q.to_dict()
    d["queryTimeIteratorClassName"] = "does.not.Exist"
    import json as _json

    class _Raw(Query):
        def __init__(self):
            self.query_id = "py-bad"

        def to_json(self):
            return _json.dumps(d)

    res = client.run_query(_Raw())
    assert not res.completed
    assert res.state == "FAILED"
