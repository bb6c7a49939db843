"""End-to-end tests for the serving façade (O6/O8), the A2 read
envelope, the S6 CSV passthrough/read-back, and the O9 shutdown hook —
driven through a real socket against an ephemeral server, mirroring how
the reference's Express app is exercised."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from node_js_etl_processor_spark.plans.pipeline import UniversitiesPipeline
from node_js_etl_processor_spark.serving import (
    AVAILABLE_ENDPOINTS,
    envelope_from_df,
    json_envelope,
    serve,
)
from tests.test_pipeline import fake_fetcher


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as resp:
            return resp.status, resp.headers, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers, e.read()


def _post(port, path):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", method="POST", data=b"")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.fixture()
def staged(spark, tmp_path):
    json_path = str(tmp_path / "data" / "universities.json")
    csv_path = str(tmp_path / "data" / "universities.csv")
    p = UniversitiesPipeline(
        spark, json_path=json_path, csv_path=csv_path, fetcher=fake_fetcher
    )
    result = p.run()
    assert result.success
    return p, json_path, csv_path


def test_index_and_catalog_404(staged):
    p, json_path, csv_path = staged
    httpd, port = serve(json_path, csv_path)
    try:
        status, _, body = _get(port, "/")
        assert status == 200
        idx = json.loads(body)
        assert idx["message"] == "University ETL API"
        assert "/api/refresh" in idx["endpoints"]

        status, _, body = _get(port, "/api/nope")
        assert status == 404
        assert json.loads(body)["availableEndpoints"] == AVAILABLE_ENDPOINTS
    finally:
        httpd.shutdown()


def test_json_endpoint_serves_a2_envelope(staged):
    p, json_path, csv_path = staged
    httpd, port = serve(json_path, csv_path)
    try:
        status, _, body = _get(port, "/api/universities/json")
        assert status == 200
        env = json.loads(body)
        assert set(env) == {"count", "data", "last_updated"}
        assert env["count"] == len(env["data"]) > 0
        assert env["last_updated"] == env["data"][0]["last_updated"]
    finally:
        httpd.shutdown()


def test_json_endpoint_unparseable_file_gets_404_envelope(staged):
    # reference parity: JSON.parse failure lands in the same catch as
    # a missing file (server.js:200-219) -> 404 {error, suggestion}
    p, json_path, csv_path = staged
    with open(json_path, "w", encoding="utf-8") as fh:
        fh.write("{not json")
    httpd, port = serve(json_path, csv_path)
    try:
        status, _, body = _get(port, "/api/universities/json")
        assert status == 404
        env = json.loads(body)
        assert set(env) == {"error", "suggestion"}
    finally:
        httpd.shutdown()


def test_csv_passthrough_and_missing_404(staged, tmp_path):
    p, json_path, csv_path = staged
    httpd, port = serve(json_path, csv_path)
    try:
        status, headers, body = _get(port, "/api/universities/csv")
        assert status == 200
        assert headers["Content-Type"] == "text/csv"
        assert "universities.csv" in headers["Content-Disposition"]
        # byte-for-byte passthrough of the staged file (S6)
        assert body == open(csv_path, "rb").read()
    finally:
        httpd.shutdown()

    httpd, port = serve(str(tmp_path / "nope.json"), str(tmp_path / "nope.csv"))
    try:
        status, _, body = _get(port, "/api/universities/csv")
        assert status == 404
        err = json.loads(body)
        assert "refresh" in err["suggestion"]
        status, _, body = _get(port, "/api/universities/json")
        assert status == 404
    finally:
        httpd.shutdown()


def test_refresh_endpoint_success_and_failure(spark, tmp_path):
    json_path = str(tmp_path / "d" / "u.json")
    csv_path = str(tmp_path / "d" / "u.csv")
    p = UniversitiesPipeline(
        spark, json_path=json_path, csv_path=csv_path, fetcher=fake_fetcher
    )
    httpd, port = serve(json_path, csv_path, refresh_fn=lambda: p.run().as_dict())
    try:
        status, body = _post(port, "/api/refresh")
        assert status == 200
        out = json.loads(body)
        assert out["message"].startswith("Data refresh completed")
        assert out["recordCount"] > 0
        # staged files now exist → json endpoint serves them
        status, _, body = _get(port, "/api/universities/json")
        assert status == 200 and json.loads(body)["count"] == out["recordCount"]
    finally:
        httpd.shutdown()

    failing = serve(
        json_path, csv_path,
        refresh_fn=lambda: {"success": False, "error": "upstream exploded"},
    )
    httpd, port = failing
    try:
        status, body = _post(port, "/api/refresh")
        assert status == 500
        err = json.loads(body)
        assert err["error"] == "Data refresh failed"
        assert err["details"] == "upstream exploded"
    finally:
        httpd.shutdown()


def test_envelope_from_df_and_json_envelope(spark):
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01T00:00:00.000Z"), (2, None, "2024-01-01T00:00:00.000Z")],
        "id long, name string, last_updated string",
    )
    env = envelope_from_df(df)
    assert env["count"] == 2
    assert env["data"][1]["name"] is None  # explicit nulls, like the sink
    assert env["last_updated"] == "2024-01-01T00:00:00.000Z"
    assert json_envelope([]) == {"count": 0, "data": [], "last_updated": None}


def test_read_csv_export_roundtrip(spark, staged):
    from node_js_etl_processor_spark.sources.files import read_csv_export

    p, json_path, csv_path = staged
    back = read_csv_export(spark, csv_path)
    staged_rows = json.load(open(json_path, encoding="utf-8"))
    assert back.count() == len(staged_rows)
    assert [f.dataType.simpleString() for f in back.schema.fields] == ["string"] * 7
    names = {r["name"] for r in back.select("name").collect()}
    assert {r["name"] for r in staged_rows} == names


def test_register_shutdown_idempotent_stop():
    from node_js_etl_processor_spark.session import register_shutdown

    class FakeSpark:
        stops = 0

        def stop(self):
            FakeSpark.stops += 1

    import signal

    prev_term, prev_int = signal.getsignal(signal.SIGTERM), signal.getsignal(signal.SIGINT)
    fake = FakeSpark()
    try:
        register_shutdown(fake)
        handler = signal.getsignal(signal.SIGTERM)
        assert callable(handler) and handler is not prev_term
        # simulate the signal path twice: stop() must run exactly once
        try:
            handler(signal.SIGTERM, None)
        except SystemExit:
            pass
        assert FakeSpark.stops == 1
    finally:
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)
