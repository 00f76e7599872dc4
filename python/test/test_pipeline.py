"""Round-trips for the client's ingest / bulk-export / WebSocket-query
surfaces (the reference python client's ingest.py, bulk_export.py and
web_socket_query.py counterparts): seed a table, ingest JSONL and
parquet through IngestJobSender (exactly-once on the job id), export
the whole table, and consume a query's result batches over a local
WebSocket endpoint.
"""

import glob
import json
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

    table_dir = tempfile.mkdtemp(prefix="graft-pytable2-")
    tracker_dir = tempfile.mkdtemp(prefix="graft-pytracker2-")
    c = GraftClient(table_dir, jar=JAR, spark_submit=SPARK_SUBMIT,
                    master="local[4]", tracker_dir=tracker_dir)
    c.seed_demo_table(rows=50, split=25)
    yield c
    shutil.rmtree(table_dir, ignore_errors=True)
    shutil.rmtree(tracker_dir, ignore_errors=True)


def test_ingest_jsonl_exactly_once(client):
    from graft_client import IngestJob, IngestJobSender

    d = tempfile.mkdtemp(prefix="graft-jsonl-")
    path = os.path.join(d, "batch.jsonl")
    with open(path, "w") as f:
        for k in range(1000, 1010):
            f.write(json.dumps({"k": k, "v": k * 10}) + "\n")
    sender = IngestJobSender(client)
    job = IngestJob([path], job_id="py-ingest-1", file_format="jsonl")
    status = sender.send(job)
    assert status["state"] == "COMMITTED", status
    assert status["rows"] == 10

    # the rows are queryable
    res = client.exact_key_query([{"k": 1005}], query_id="py-ingested")
    assert res.completed and res.row_count == 1
    assert res.rows()[0]["v"] == 10050

    # resubmitting the same job id is a recorded no-op
    again = sender.send(IngestJob([path], job_id="py-ingest-1", file_format="jsonl"))
    assert again["state"] == "DUPLICATE", again
    res2 = client.exact_key_query([{"k": 1005}], query_id="py-ingested-2")
    assert res2.completed and res2.row_count == 1  # no duplicate row


def test_ingest_parquet(client):
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq
    from graft_client import IngestJob, IngestJobSender

    d = tempfile.mkdtemp(prefix="graft-parquet-")
    path = os.path.join(d, "batch.parquet")
    ks = list(range(2000, 2005))
    pq.write_table(
        pa.table({"k": pa.array(ks, pa.int64()),
                  "v": pa.array([k * 10 for k in ks], pa.int64())}), path)
    status = IngestJobSender(client).send(
        IngestJob([path], job_id="py-ingest-2", file_format="parquet"))
    assert status["state"] == "COMMITTED", status
    assert status["rows"] == 5


def test_bulk_export_whole_table(client):
    pytest.importorskip("pyarrow")
    from graft_client import BulkExportQuery, BulkExportSender

    res = BulkExportSender(client).send(BulkExportQuery(export_id="py-export-1"))
    assert res.completed, res
    # 50 seeded + 10 jsonl + 5 parquet rows
    assert res.row_count == 65
    rows = {(r["k"], r["v"]) for r in res.rows()}
    assert len(rows) == 65
    assert (7, 70) in rows and (1005, 10050) in rows and (2004, 20040) in rows


def test_web_socket_query_consumption(client):
    from graft_client import Query, Range, Region, WebSocketQueryProcessor

    q = Query(query_id="py-ws-1",
              regions=[Region({"k": Range(min=10, max=20)})])
    status, rows = WebSocketQueryProcessor(client).run(q)
    assert status.completed, status
    assert status.row_count == 10
    assert {(r["k"], r["v"]) for r in rows} == {(k, k * 10) for k in range(10, 20)}


@pytest.fixture(scope="module")
def lww_client():
    import sys
    sys.path.insert(0, os.path.join(REPO, "python"))
    from graft_client import GraftClient

    table_dir = tempfile.mkdtemp(prefix="graft-pylww-")
    tracker_dir = tempfile.mkdtemp(prefix="graft-pylwwtrk-")
    c = GraftClient(table_dir, jar=JAR, spark_submit=SPARK_SUBMIT,
                    master="local[4]", tracker_dir=tracker_dir)
    c.seed_demo_table(rows=30, split=15, agg_config="last(v)")
    yield c
    shutil.rmtree(table_dir, ignore_errors=True)
    shutil.rmtree(tracker_dir, ignore_errors=True)


def test_merge_cdc_batch_exactly_once(lww_client):
    """MERGE INTO through spark-submit: one CDC batch updates a matched
    key, inserts an unmatched one, and deletes a marked one — ONE atomic
    commit; resubmitting the job id is a recorded no-op."""
    from graft_client import MergeJob, MergeJobSender

    d = tempfile.mkdtemp(prefix="graft-merge-")
    path = os.path.join(d, "cdc.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"k": 7, "v": 777, "_op": "put"}) + "\n")      # update
        f.write(json.dumps({"k": 1000, "v": 1, "_op": "put"}) + "\n")     # insert
        f.write(json.dumps({"k": 9, "v": 0, "_op": "delete"}) + "\n")     # delete

    sender = MergeJobSender(lww_client)
    status = sender.send(MergeJob([path], job_id="py-merge-1", file_format="jsonl"))
    assert status["state"] == "COMMITTED", status
    assert status["putRows"] == 2 and status["deleteKeys"] == 1

    res = lww_client.exact_key_query(
        [{"k": 7}, {"k": 9}, {"k": 1000}, {"k": 8}], query_id="py-merged")
    assert res.completed, res
    got = {r["k"]: r["v"] for r in res.rows()}
    assert got == {7: 777, 1000: 1, 8: 80}  # 9 deleted, 8 untouched

    # exactly-once: the same job id neither re-puts nor re-deletes
    again = sender.send(MergeJob([path], job_id="py-merge-1", file_format="jsonl"))
    assert again["state"] == "DUPLICATE", again
    res2 = lww_client.exact_key_query([{"k": 7}], query_id="py-merged-2")
    assert res2.completed and res2.row_count == 1


def test_admin_delete_time_travel_clone(lww_client):
    """Admin surface round-trip: capture a version, delete keys
    (exactly-once tombstones), time-travel a query to the pre-delete
    version, and clone the table at that version into an independent
    directory."""
    from graft_client import DeleteJob, GraftClient

    admin = lww_client.admin()
    v_before = admin.table_version()
    assert isinstance(v_before, int) and v_before >= 1

    # inline-key delete: generation-aware tombstones, no data rewrite
    status = admin.delete_keys(DeleteJob(keys=[2, 3], job_id="py-del-1"))
    assert status["state"] == "COMMITTED", status
    assert status["deleteKeys"] == 2

    res = lww_client.exact_key_query(
        [{"k": 2}, {"k": 3}, {"k": 4}], query_id="py-del-check")
    assert res.completed, res
    got = {r["k"]: r["v"] for r in res.rows()}
    assert got == {4: 40}, got  # 2 and 3 gone, 4 untouched

    # exactly-once: resubmitting the job id is a recorded no-op
    again = admin.delete_keys(DeleteJob(keys=[2, 3], job_id="py-del-1"))
    assert again["state"] == "DUPLICATE", again

    # time travel: the pre-delete version still shows the keys
    old = lww_client.exact_key_query(
        [{"k": 2}, {"k": 3}], query_id="py-asof", as_of_version=v_before)
    assert old.completed, old
    assert {r["k"]: r["v"] for r in old.rows()} == {2: 20, 3: 30}

    # clone at the pre-delete version: an independent table with the keys
    clone_dir = tempfile.mkdtemp(prefix="graft-pyclone-") + "/t"
    st = admin.clone_at(clone_dir, v_before)
    assert st["state"] == "OK", st
    clone = GraftClient(clone_dir, jar=JAR, spark_submit=SPARK_SUBMIT,
                        master="local[4]")
    cres = clone.exact_key_query([{"k": 2}, {"k": 3}], query_id="py-clone-q")
    assert cres.completed, cres
    assert {r["k"]: r["v"] for r in cres.rows()} == {2: 20, 3: 30}
    # and the clone is independent: deleting there leaves the source alone
    cstatus = clone.admin().delete_keys(DeleteJob(keys=[4], job_id="py-del-clone"))
    assert cstatus["state"] == "COMMITTED", cstatus
    src4 = lww_client.exact_key_query([{"k": 4}], query_id="py-src-4")
    assert src4.completed and src4.row_count == 1

    # shallow clone: zero-copy branch — no parquet under the branch's
    # data dir, but the pinned read resolves through the source's files
    sclone_dir = tempfile.mkdtemp(prefix="graft-pysclone-") + "/t"
    sst = admin.clone_at(sclone_dir, v_before, shallow=True)
    assert sst["state"] == "OK" and sst.get("shallow") is True, sst
    branch_parquets = [
        p for p in glob.glob(os.path.join(sclone_dir, "data", "**", "*.parquet"),
                             recursive=True)]
    assert branch_parquets == [], branch_parquets
    sclone = GraftClient(sclone_dir, jar=JAR, spark_submit=SPARK_SUBMIT,
                         master="local[4]")
    sres = sclone.exact_key_query([{"k": 2}, {"k": 3}], query_id="py-sclone-q")
    assert sres.completed, sres
    assert {r["k"]: r["v"] for r in sres.rows()} == {2: 20, 3: 30}


def test_admin_set_properties():
    """Versioned property edits through spark-submit: an ageOff filter
    set on a live table ages out every (ancient-epoch) row, and
    clearing it brings them back — the reference's admin property
    editor as one validated metadata transaction."""
    from graft_client import GraftClient

    table_dir = tempfile.mkdtemp(prefix="graft-pyprops-")
    c = GraftClient(table_dir, jar=JAR, spark_submit=SPARK_SUBMIT,
                    master="local[4]")
    c.seed_demo_table(rows=10, split=5)
    admin = c.admin()

    # v values (10..100) read as ~1970 epoch-ms: any bounded maxAge ages them
    st = admin.set_properties({"filter": "ageOff(v,1000000)"})
    assert st["state"] == "OK" and st["applied"] == 1, st
    res = c.exact_key_query([{"k": 1}, {"k": 2}], query_id="py-props-aged")
    assert res.completed and res.row_count == 0, res

    st2 = admin.set_properties({"filter": ""})
    assert st2["state"] == "OK", st2
    res2 = c.exact_key_query([{"k": 1}, {"k": 2}], query_id="py-props-back")
    assert res2.completed and res2.row_count == 2, res2

    # validation errors surface: unknown column in the filter
    bad = admin.set_properties({"filter": "ageOff(zzz,1)"})
    assert bad["state"] == "FAILED" and bad["error"], bad


def test_admin_restore():
    """RESTORE to a captured version through spark-submit: one metadata
    commit rolls the table back; the table keeps accepting writes."""
    from graft_client import GraftClient, IngestJob, IngestJobSender

    table_dir = tempfile.mkdtemp(prefix="graft-pyrestore-")
    c = GraftClient(table_dir, jar=JAR, spark_submit=SPARK_SUBMIT,
                    master="local[4]")
    c.seed_demo_table(rows=10, split=5, agg_config="last(v)")
    admin = c.admin()
    v1 = admin.table_version()

    # mutate: overwrite k=1 via an ingest batch, then roll back
    d = tempfile.mkdtemp(prefix="graft-restore-batch-")
    path = os.path.join(d, "b.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"k": 1, "v": 999}) + "\n")
    sender = IngestJobSender(c)
    st = sender.send(IngestJob(files=[path], file_format="jsonl"))
    assert st["state"] == "COMMITTED", st
    r = c.exact_key_query([{"k": 1}], query_id="py-restore-pre")
    assert {x["v"] for x in r.rows()} == {999}

    rs = admin.restore_to(v1)
    assert rs["state"] == "OK", rs
    r2 = c.exact_key_query([{"k": 1}], query_id="py-restore-post")
    assert {x["v"] for x in r2.rows()} == {10}, r2.rows()

    # restoring to a bogus version fails loudly
    bad = admin.restore_to(99999)
    assert bad["state"] == "FAILED" and bad["error"], bad
