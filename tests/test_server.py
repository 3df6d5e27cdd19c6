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


def test_rest_get_delete_keyword_hybrid(served):
    port = served
    call(port, "POST", "/collections", {"name": "kb", "dimensions": 64})
    call(port, "POST", "/collections/kb/add",
         {"ids": ["x", "y", "z"],
          "documents": ["spark joins data", "brown foxes run", "hash join strategies"]})
    status, doc = call(port, "GET", "/collections/kb/get/y")
    assert status == 200 and doc["_document"] == "brown foxes run"
    assert call(port, "GET", "/collections/kb/get/missing")[0] == 404
    status, kw = call(port, "POST", "/collections/kb/keyword", {"query": "hash join", "n_results": 2})
    assert status == 200 and kw["results"][0]["id"] == "z"
    status, hy = call(port, "POST", "/collections/kb/hybrid", {"query": "spark joins data", "n_results": 2})
    assert status == 200 and hy["results"][0]["id"] == "x"
    assert call(port, "POST", "/collections/kb/delete", {"ids": ["x"]})[1] == {"deleted": 1}
    assert call(port, "GET", "/collections/kb/count")[1] == {"count": 2}
