"""Actuator lifecycle + metrics + CLI app (reference §2.8 surface)."""

from __future__ import annotations

import json
import time
import urllib.request

from cassandra_extractor_spark.actuator import Actuator, ExtractionJob, JobState
from cassandra_extractor_spark.metrics import MetricsRegistry


def _wait(cond, timeout=30):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.05)
    return False


def test_metrics_exposition():
    m = MetricsRegistry()
    m.inc("rows_processed_total", 5, table="t1")
    m.set_gauge("progress", 0.5, table="t1")
    with m.time("extract_seconds", table="t1"):
        pass
    text = m.exposition()
    assert 'rows_processed_total{table="t1"} 5.0' in text
    assert "extract_seconds_count" in text
    assert "# TYPE cassandra_extractor_spark_progress gauge" in text


def test_job_lifecycle(spark):
    actuator = Actuator(spark)
    done = []

    def run(job):
        done.append(spark.range(1000).count())
        job.processed = 1000
        job.total = 1000

    job = actuator.create(ExtractionJob(table="t", run=run))
    assert job.state == JobState.CREATED
    actuator.start("t")
    assert _wait(lambda: job.state == JobState.DONE)
    assert done == [1000]
    stats = actuator.stats()["t"]
    assert stats["progress_pct"] == 100.0


def test_job_failure_reported(spark):
    actuator = Actuator(spark)

    def run(job):
        raise RuntimeError("sink exploded")

    job = actuator.create(ExtractionJob(table="bad", run=run))
    actuator.start("bad")
    assert _wait(lambda: job.state == JobState.FAILED)
    assert "sink exploded" in job.error


def test_pause_cancels_jobs(spark):
    actuator = Actuator(spark)
    started = []

    def run(job):
        started.append(True)
        # long job: pause should cancel the job group mid-flight
        spark.range(2_000_000_000).selectExpr("sum(id * id)").collect()

    job = actuator.create(ExtractionJob(table="slow", run=run))
    actuator.start("slow")
    assert _wait(lambda: bool(started))
    time.sleep(0.3)
    actuator.pause("slow")
    assert _wait(lambda: not job._thread.is_alive(), timeout=60)
    assert job.state == JobState.PAUSED


def test_scale_up_down(spark):
    actuator = Actuator(spark)
    actuator.create(ExtractionJob(table="t", run=lambda j: None))
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert actuator.scale("t", +1)["parallelism"] == base + 1
    assert actuator.scale("t", -1)["parallelism"] == base


def test_rest_endpoints(spark):
    actuator = Actuator(spark)
    actuator.metrics.inc("extractions_total", table="t")
    actuator.masked_config = {"db.password": "hunter2", "db.host": "h"}

    def run(job):
        job.processed = job.total = 10

    actuator.create(ExtractionJob(table="t", run=run))
    server = actuator.serve()
    port = server.server_port
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return r.read().decode()

        def post(path, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        assert "extractions_total" in get("/metrics")
        # /state dumps HWM + staged config (reference GET /cache, M3)
        from cassandra_extractor_spark.streaming.hwm import HighWaterMarkStore
        import tempfile

        store = HighWaterMarkStore(tempfile.mktemp())
        store.set("t", "2024-01-01 00:00:00")
        actuator.hwm_store = store
        # staged secrets must come back masked, same rule as /config
        actuator.jobs["t"].config = {"db.password": "hunter2", "db.host": "h"}
        state = json.loads(get("/state"))
        assert state["hwm"]["t"] == "2024-01-01 00:00:00"
        assert state["job_config"]["t"]["db.password"] == "***"
        assert state["job_config"]["t"]["db.host"] == "h"
        cfg = json.loads(get("/config"))
        assert cfg["db.password"] == "***" and cfg["db.host"] == "h"
        assert post("/start", {"table": "t"})["status"] == "started"
        assert _wait(lambda: actuator.jobs["t"].state == JobState.DONE)
        assert json.loads(get("/stats"))["t"]["state"] == "done"
        assert post("/scaleup", {"instance": ["t"]})["parallelism"] > 0
        # unknown table -> 404
        try:
            post("/start", {"table": "nope"})
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_hot_config_reload(spark):
    actuator = Actuator(spark)
    seen = []

    def run(job):
        seen.append(dict(job.config))

    job = actuator.create(ExtractionJob(table="t", run=run))
    actuator.start("t")
    assert _wait(lambda: len(seen) == 1)
    res = actuator.set_config("t", "cassandra.fetch_size=500\nsink=jsonl")
    assert res["keys"] == ["cassandra.fetch_size", "sink"]
    actuator.resume("t")
    assert _wait(lambda: len(seen) == 2)
    assert seen[0] == {} and seen[1]["cassandra.fetch_size"] == "500"


def test_per_table_config_overlay(tmp_path):
    from cassandra_extractor_spark.config import load_table_properties

    global_props = {
        "filter": "1=1",
        "tables.events.filter": "event_type = 'click'",
        "limit": "5",
        # a dotted config key whose first segment looks like a table
        # name must NOT be treated as an overlay (collision guard)
        "solr.filter": "type:log",
    }
    tdir = tmp_path / "tconf"
    tdir.mkdir()
    (tdir / "orders.properties").write_text("limit=9\nsort=o_orderkey")
    ev = load_table_properties(global_props, "events", str(tdir))
    assert ev["filter"] == "event_type = 'click'"  # namespaced key wins
    assert ev["limit"] == "5"
    solr_tbl = load_table_properties(global_props, "solr", str(tdir))
    assert solr_tbl["filter"] == "1=1"  # 'solr.filter' did NOT leak in
    od = load_table_properties(global_props, "orders", str(tdir))
    assert od["limit"] == "9" and od["sort"] == "o_orderkey"  # file overlay
    assert od["filter"] == "1=1"


def test_cli_app_table_overlay(spark, sf_dir, tmp_path):
    from cassandra_extractor_spark import app as app_mod

    out = str(tmp_path / "out_ov")
    props = tmp_path / "job.properties"
    props.write_text("tables.events.filter=event_type = 'signup'\n")
    rc = app_mod.main(
        ["-T", "events", "--sf-dir", sf_dir, "--output", out, "--properties", str(props)]
    )
    assert rc == 0
    types = {
        r["event_type"]
        for r in spark.read.json(f"{out}/events").select("event_type").distinct().collect()
    }
    assert types == {"signup"}


def test_cli_app(spark, sf_dir, tmp_path, monkeypatch):
    from cassandra_extractor_spark import app as app_mod

    out = str(tmp_path / "out")
    rc = app_mod.main(
        [
            "-T",
            "events",
            "--sf-dir",
            sf_dir,
            "--output",
            out,
            "--filter",
            "event_type = 'click'",
        ]
    )
    assert rc == 0
    back = spark.read.json(f"{out}/events")
    assert back.count() > 0
    assert set(r["event_type"] for r in back.select("event_type").distinct().collect()) == {"click"}


def test_rest_create_and_cache(spark):
    """POST /create (factory-built job, then start) + GET /cache +
    POST /cache/clear — reference management.py:306-333,130-160,394-419."""
    import json
    import tempfile
    import urllib.error
    import urllib.request

    actuator = Actuator(spark)

    def factory(table, props):
        def run(job):
            job.processed = job.total = 5

        return ExtractionJob(table=table, run=run)

    actuator.job_factory = factory
    from cassandra_extractor_spark.streaming.hwm import HighWaterMarkStore

    store = HighWaterMarkStore(tempfile.mktemp())
    store.set("orders", "2024-02-02 00:00:00")
    store.set("events", "2024-03-03 00:00:00")
    actuator.hwm_store = store
    server = actuator.serve()
    port = server.server_port
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return json.loads(r.read())

        def post(path, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        # create-then-start, properties staged on the job
        out = post("/create", {"table": "orders", "properties": "sinks=jsonl\nlimit=10"})
        assert out == {"status": "created", "table": "orders", "state": "created"}
        assert actuator.jobs["orders"].config["sinks"] == "jsonl"
        assert post("/start", {"table": "orders"})["status"] == "started"
        assert _wait(lambda: actuator.jobs["orders"].state == JobState.DONE)
        # duplicate create -> 500 with explanation
        try:
            post("/create", {"table": "orders"})
            raise AssertionError("expected 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500 and "already exists" in e.read().decode()
        # missing table -> 400
        try:
            post("/create", {})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # GET /cache is the reference route name for the state dump
        cache = get("/cache")
        assert cache["hwm"]["orders"] == "2024-02-02 00:00:00"
        # targeted clear drops one table's HWM + staged config only
        out = post("/cache/clear", {"table": "orders"})
        assert out["hwm"] == ["orders"] and out["job_config"] == ["orders"]
        assert actuator.jobs["orders"].config == {}
        assert store.get("orders") is None
        assert store.get("events") == "2024-03-03 00:00:00"
        # clear-all drops the rest
        out = post("/cache/clear", {})
        assert out["hwm"] == ["events"]
        assert store.dump() == {}
    finally:
        server.shutdown()


def test_maintenance_compact_route(spark, tmp_path):
    """POST /maintenance/compact drives the three stores' maintenance
    jobs over HTTP; unknown kinds fail loudly."""
    import urllib.error

    import pandas as pd
    from pyspark.sql import functions as F

    from cassandra_extractor_spark.streaming.posting_stream import (
        boolean_query_against_store,
        build_postings,
        write_posting_store,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["join scan merge", "join scan"]}),
        "doc_id LONG, text STRING",
    )
    write_posting_store(
        build_postings(docs.where(F.col("doc_id") == 0)), "compact_route_t", n_buckets=2
    )
    delta = str(tmp_path / "delta")
    build_postings(docs.where(F.col("doc_id") == 1)).write.mode("overwrite").parquet(
        f"{delta}/batch=0"
    )
    actuator = Actuator(spark, MetricsRegistry())
    server = actuator.serve()
    port = server.server_port
    try:
        def post(path, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        out = post(
            "/maintenance/compact",
            {"store": "posting", "table": "compact_route_t", "delta_dir": delta,
             "n_buckets": 2},
        )
        assert out == {"status": "compacted", "store": "posting", "absorbed": 2}
        # the folded base answers alone (delta gone)
        got = {
            r.doc_id
            for r in boolean_query_against_store(
                spark, "compact_route_t", delta, ("join", "scan")
            ).collect()
        }
        assert got == {0, 1}
        # idempotent second run: nothing to absorb
        out2 = post(
            "/maintenance/compact",
            {"store": "posting", "table": "compact_route_t", "delta_dir": delta,
             "n_buckets": 2},
        )
        assert out2["absorbed"] == 0
        # unknown store kind -> 500 with the error surfaced
        try:
            post("/maintenance/compact", {"store": "bogus"})
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "unknown store kind" in json.loads(e.read())["error"]
    finally:
        server.shutdown()
        spark.sql("DROP TABLE IF EXISTS compact_route_t")


def test_auto_compaction_policy(spark, tmp_path):
    """Size-ratio auto-compaction (round-11): mode=check reports the
    policy without folding; mode=auto folds exactly once when the
    delta/base byte ratio crosses the threshold and is a no-op when it
    does not (and idempotent when re-run after a fold)."""
    import urllib.request as _rq

    import pandas as pd
    from pyspark.sql import functions as F

    from cassandra_extractor_spark.streaming.posting_stream import (
        build_postings,
        write_posting_store,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(range(8)), "text": ["join scan merge sort"] * 8}
        ),
        "doc_id LONG, text STRING",
    )
    write_posting_store(
        build_postings(docs.where(F.col("doc_id") < 7)), "policy_t", n_buckets=2
    )
    delta = str(tmp_path / "delta")
    build_postings(docs.where(F.col("doc_id") == 7)).write.mode("overwrite").parquet(
        f"{delta}/batch=0"
    )
    actuator = Actuator(spark, MetricsRegistry())
    server = actuator.serve()
    port = server.server_port
    try:
        def post(body):
            req = _rq.Request(
                f"http://127.0.0.1:{port}/maintenance/compact",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with _rq.urlopen(req) as r:
                return json.loads(r.read())

        base = {"store": "posting", "table": "policy_t", "delta_dir": delta,
                "n_buckets": 2}
        # check: reports, never folds
        chk = post({**base, "mode": "check", "threshold": 0.01})
        assert chk["should_compact"] is True and chk["compacted"] is False
        assert chk["delta_bytes"] > 0 and chk["base_bytes"] > 0
        # below threshold: auto is a no-op
        skip = post({**base, "mode": "auto", "threshold": 1e9})
        assert skip["compacted"] is False and skip["status"] == "policy"
        assert (tmp_path / "delta").exists()
        # above threshold: auto folds exactly once
        did = post({**base, "mode": "auto", "threshold": 0.01})
        assert did["compacted"] is True and did["absorbed"] > 0
        assert not (tmp_path / "delta").exists()
        # idempotent re-run: policy sees an empty delta, no fold
        again = post({**base, "mode": "auto", "threshold": 0.01})
        assert again["compacted"] is False and again["delta_bytes"] == 0
        # bad mode fails loudly
        import urllib.error

        try:
            post({**base, "mode": "sometimes"})
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert "unknown compaction mode" in json.loads(e.read())["error"]
    finally:
        server.shutdown()
        spark.sql("DROP TABLE IF EXISTS policy_t")


def test_posting_policy_counts_doclen_and_validates_pair(spark, tmp_path):
    """Round-12: (a) doclen_table without doclen_delta_dir is rejected
    up front with a ValueError (not a raw KeyError mid-fold → opaque
    HTTP 500); (b) the size-ratio policy counts the doclen delta's
    bytes, so a doclen delta alone can trip auto-compaction even when
    the posting delta is empty (postings compacted out-of-band)."""
    import pandas as pd
    import pytest

    from cassandra_extractor_spark.streaming.posting_stream import (
        build_doclens,
        build_postings,
        write_doclen_store,
        write_posting_store,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["join scan", "merge sort"]}),
        "doc_id LONG, text STRING",
    )
    write_posting_store(build_postings(docs), "dlpol_t", n_buckets=2)
    write_doclen_store(build_doclens(docs), "dlpol_dl", n_buckets=2)
    dl_delta = str(tmp_path / "dl_delta")
    build_doclens(docs).write.mode("overwrite").parquet(f"{dl_delta}/batch=0")
    actuator = Actuator(spark, MetricsRegistry())
    try:
        bad = {"table": "dlpol_t", "delta_dir": str(tmp_path / "nodelta"),
               "doclen_table": "dlpol_dl"}
        with pytest.raises(ValueError, match="doclen_table requires doclen_delta_dir"):
            actuator.compact_store("posting", bad)
        # round-13 (advisor): the descriptive error also fires on the
        # policy-only entry points, not a raw KeyError
        with pytest.raises(ValueError, match="doclen_table requires doclen_delta_dir"):
            actuator.store_sizes("posting", bad)
        with pytest.raises(ValueError, match="doclen_table requires doclen_delta_dir"):
            actuator.compaction_policy("posting", bad)
        base_params = {"table": "dlpol_t", "delta_dir": str(tmp_path / "nodelta")}
        dl_params = {**base_params, "doclen_table": "dlpol_dl",
                     "doclen_delta_dir": dl_delta}
        b0, d0 = actuator.store_sizes("posting", base_params)
        b1, d1 = actuator.store_sizes("posting", dl_params)
        assert d0 == 0 and d1 > 0  # doclen delta bytes now count
        assert b1 > b0  # and the doclen base counts on the base side
        # the doclen-only delta trips the auto policy and folds
        out = actuator.compact_store(
            "posting", {**dl_params, "mode": "auto", "threshold": 1e-9, "n_buckets": 2}
        )
        assert out["compacted"] is True and out["absorbed"] == 2
        assert not (tmp_path / "dl_delta").exists()
    finally:
        spark.sql("DROP TABLE IF EXISTS dlpol_t")
        spark.sql("DROP TABLE IF EXISTS dlpol_dl")


def test_cdc_retention_over_control_plane(spark, tmp_path):
    """CDC retention ops ride /maintenance/compact (round-11): a purge
    drops tombstones below the horizon AND records the horizon fence —
    a post-purge stale update below the horizon is rejected; a retain
    op prunes old manifests/generations but never the current one."""
    import urllib.request as _rq

    import pandas as pd

    from cassandra_extractor_spark.streaming.cdc_stream import (
        _current_manifest,
        _manifest_seqs,
        apply_cdc_batch,
        init_cdc_store,
        read_cdc_view,
    )

    store = str(tmp_path / "cdc")
    seed = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "v": ["a", "b"], "op": ["U", "U"], "ts": [0, 0]}),
        "k LONG, v STRING, op STRING, ts LONG",
    )
    init_cdc_store(spark, seed, store, key="k", op_col="op", order_cols=["ts"], n_buckets=2)
    # delete key 1 at ts=5
    apply_cdc_batch(
        spark,
        spark.createDataFrame(
            pd.DataFrame({"k": [1], "v": [None], "op": ["D"], "ts": [5]}),
            "k LONG, v STRING, op STRING, ts LONG",
        ),
        0, store, key="k", order_cols=["ts"], op_col="op",
        payload_cols=["v"], retain_gens=0,
    )
    actuator = Actuator(spark, MetricsRegistry())
    server = actuator.serve()
    port = server.server_port
    try:
        def post(body):
            req = _rq.Request(
                f"http://127.0.0.1:{port}/maintenance/compact",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with _rq.urlopen(req) as r:
                return json.loads(r.read())

        out = post({"store": "cdc", "op": "purge_tombstones", "store_dir": store,
                    "order_cols": ["ts"], "horizon": [10]})
        assert out["status"] == "purged" and out["horizon"] == [10]
        assert _current_manifest(store)["horizon"] == [10]
        # horizon fence: stale update (ts=3 < 10) for the purged key is
        # rejected — key 1 stays deleted
        apply_cdc_batch(
            spark,
            spark.createDataFrame(
                pd.DataFrame({"k": [1], "v": ["zombie"], "op": ["U"], "ts": [3]}),
                "k LONG, v STRING, op STRING, ts LONG",
            ),
            1, store, key="k", order_cols=["ts"], op_col="op",
            payload_cols=["v"], retain_gens=0,
        )
        view = {r.k: r.v for r in read_cdc_view(spark, store).collect()}
        assert view == {2: "b"}
        # retention: keep only the newest manifest; current survives
        n_before = len(_manifest_seqs(store))
        rep = post({"store": "cdc", "op": "retain", "store_dir": store,
                    "retain_gens": 1})
        assert rep["status"] == "retained"
        assert rep["removed_manifests"] == n_before - 1
        assert len(rep["retained_seqs"]) == 1
        view2 = {r.k: r.v for r in read_cdc_view(spark, store).collect()}
        assert view2 == {2: "b"}
        # unknown op fails loudly
        import urllib.error

        try:
            post({"store": "cdc", "op": "vacuum", "store_dir": store})
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert "unknown cdc maintenance op" in json.loads(e.read())["error"]
    finally:
        server.shutdown()
