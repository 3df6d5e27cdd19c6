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


def _read_sse_events(resp, n, timeout=60.0):
    """Read n SSE data events from a streaming response."""
    import time as _time

    events, buf = [], b""
    deadline = _time.time() + timeout
    while len(events) < n and _time.time() < deadline:
        chunk = resp.readline()
        if not chunk:
            break
        buf += chunk
        if chunk == b"\n":  # frame terminator
            for line in buf.decode().splitlines():
                if line.startswith("data: "):
                    events.append(json.loads(line[len("data: "):]))
            buf = b""
    return events


def test_sse_subscribe_insert_receive(served):
    """R1/P10 push semantics: subscribe → mutate → the event arrives on the
    open stream (reference realtime.py:449-510)."""
    import threading

    port = served
    call(port, "POST", "/collections", {"name": "kb", "dimensions": 64})

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/collections/kb/events?types=add,delete"
    )
    resp = urllib.request.urlopen(req, timeout=60)
    assert resp.headers["Content-Type"] == "text/event-stream"

    def mutate():
        call(port, "POST", "/collections/kb/add",
             {"ids": ["a"], "documents": ["pushed doc"]})
        call(port, "POST", "/collections/kb/delete", {"ids": ["a"]})

    t = threading.Thread(target=mutate)
    t.start()
    events = _read_sse_events(resp, 2)
    t.join()
    resp.close()
    assert [e["event_type"] for e in events] == ["add", "delete"]
    assert events[0]["collection"] == "kb" and events[0]["ids"] == ["a"]
    assert events[0]["seq"] < events[1]["seq"]


def test_sse_replay_and_type_filter(served):
    """R4 replay: events published BEFORE subscribing are delivered from the
    ring buffer, marked replayed, honoring the type filter."""
    port = served
    call(port, "POST", "/collections", {"name": "kb", "dimensions": 64})
    call(port, "POST", "/collections/kb/add", {"ids": ["a"], "documents": ["one"]})
    call(port, "POST", "/collections/kb/add", {"ids": ["b"], "documents": ["two"]})
    call(port, "POST", "/collections/kb/delete", {"ids": ["a"]})

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/collections/kb/events?types=add&replay=10"
    )
    resp = urllib.request.urlopen(req, timeout=60)
    events = _read_sse_events(resp, 2)
    resp.close()
    assert [e["event_type"] for e in events] == ["add", "add"]
    assert [e["ids"] for e in events] == [["a"], ["b"]]
    assert all(e.get("replayed") for e in events)
