"""REST layer over a real socket: create → add → query → count → delete."""

from __future__ import annotations

import json
import urllib.request

import pytest

from custom_python_vectordb_spark.api import VectorDB
from custom_python_vectordb_spark.server import serve_background


def call(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode() if body is not None else None,
        method=method,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def served(spark, tmp_path):
    srv, port = serve_background(VectorDB(spark, str(tmp_path / "wh")))
    yield port
    srv.shutdown()


def test_rest_roundtrip(served):
    port = served
    assert call(port, "GET", "/collections")[1] == {"collections": []}
    assert call(port, "POST", "/collections", {"name": "kb", "dimensions": 64})[0] == 201
    status, out = call(
        port, "POST", "/collections/kb/add",
        {"ids": ["x", "y"], "documents": ["spark joins data", "brown foxes run"]},
    )
    assert (status, out) == (201, {"added": 2})
    assert call(port, "GET", "/collections/kb/count")[1] == {"count": 2}
    status, out = call(
        port, "POST", "/collections/kb/query",
        {"query_texts": ["spark joins data"], "n_results": 1},
    )
    assert status == 200 and out["results"][0][0]["id"] == "x"
    assert out["results"][0][0]["dist"] == pytest.approx(0.0, abs=1e-6)
    assert call(port, "DELETE", "/collections/kb")[1] == {"deleted": True}
    assert call(port, "GET", "/collections")[1] == {"collections": []}


def test_rest_errors(served):
    port = served
    assert call(port, "GET", "/collections/nope/count")[0] == 404
    assert call(port, "GET", "/bogus")[0] == 404
    assert call(port, "POST", "/collections", {"dimensions": 4})[0] == 400  # missing name
