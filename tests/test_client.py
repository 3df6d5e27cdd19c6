"""Python client SDK over a real socket: the full CRUD + query cycle of the
reference's client test (``/root/reference/tests/test_client.py:258-285``),
driven through client.Client → HTTP → server.py → the Spark engine."""

from __future__ import annotations

import pytest

from custom_python_vectordb_spark.api import VectorDB
from custom_python_vectordb_spark.client import Client, ClientError
from custom_python_vectordb_spark.server import serve_background


@pytest.fixture()
def client(spark, tmp_path):
    # r13: build-affecting geometry (n_cells, assign_r) is operator-
    # allowlisted (make_server ann_geometries=...); the tiny test geometry
    # the cycle below exercises must be granted explicitly, like a real
    # deployment would grant its collection's geometry.
    srv, port = serve_background(
        VectorDB(spark, str(tmp_path / "wh")),
        ann_geometries={(64, 2), (2, 1)},
    )
    yield Client(f"http://127.0.0.1:{port}")
    srv.shutdown()


def test_full_crud_query_cycle(client):
    assert client.heartbeat()
    assert client.list_collections() == []

    coll = client.create_collection("kb", dimensions=64)
    assert client.list_collections() == ["kb"]
    assert client.get_or_create_collection("kb").name == "kb"

    # add with metadata → count
    assert coll.add(
        ids=["a", "b", "c"],
        documents=["spark joins data", "brown foxes run", "joins in spark"],
        metadatas=[{"lang": "en", "stars": 5}, {"lang": "en", "stars": 1}, {"lang": "de", "stars": 3}],
    ) == 3
    assert coll.count() == 3
    assert len(coll) == 3

    # duplicate insert is rejected; upsert is the update path
    with pytest.raises(ClientError) as e:
        coll.add(ids=["a"], documents=["dupe"])
    assert e.value.status == 400

    # query: exact self-match first; where-filter changes the winner
    hits = coll.query(query_texts=["spark joins data"], n_results=2)
    assert hits[0][0]["id"] == "a"
    assert hits[0][0]["dist"] == pytest.approx(0.0, abs=1e-6)
    hits = coll.query(query_texts=["spark joins data"], n_results=2, where={"lang": "de"})
    assert [h["id"] for h in hits[0]] == ["c"]
    # a filter matching nothing still yields a positional (empty) slot
    assert coll.query(query_texts=["x"], n_results=2, where={"lang": "fr"}) == [[]]
    # accelerated tiers route through the same positional contract; on a
    # corpus this tiny every cell is probed and the rerank is exact
    hits = coll.query(query_texts=["spark joins data"], n_results=1, ivfpq=True, fetch_k=10)
    assert hits[0][0]["id"] == "a"
    # r12: per-request index geometry rides through index_params; the
    # server contract-validates (400 on out-of-range, never a numpy error)
    hits = coll.query(
        query_texts=["spark joins data"], n_results=1, ann=True,
        index_params={"n_cells": 2, "nprobe": 2, "assign_r": 1},
    )
    assert hits[0][0]["id"] == "a"
    with pytest.raises(ClientError) as e:
        coll.query(query_texts=["x"], ann=True, index_params={"n_cells": 0})
    assert e.value.status == 400
    # r13: a geometry outside the operator allowlist is refused with a
    # 400 naming the allowed set — clients cannot trigger an unbounded
    # k-means retrain by sweeping build parameters
    with pytest.raises(ClientError) as e:
        coll.query(
            query_texts=["x"], ann=True,
            index_params={"n_cells": 3, "nprobe": 1, "assign_r": 1},
        )
    assert e.value.status == 400 and "allowed set" in str(e.value)

    # get / peek carry the document and metadata
    got = coll.get("a")
    assert got["_document"] == "spark joins data" and got["lang"] == "en"
    assert coll.get("zzz") is None
    rows = coll.peek(2)
    assert [r["id"] for r in rows] == ["a", "b"]

    # upsert replaces content; update merges metadata (absent keys kept)
    coll.upsert(ids=["a"], documents=["completely new text"], metadatas=[{"lang": "en"}])
    assert coll.count() == 3
    assert coll.get("a")["_document"] == "completely new text"
    coll.update(ids=["b"], metadatas=[{"lang": "fr"}])
    b = coll.get("b")
    assert b["lang"] == "fr" and b["stars"] == 1  # stars survived the merge

    # keyword + hybrid search answer over the same corpus
    kw = coll.keyword_search("joins", n_results=5)
    assert {h["id"] for h in kw} == {"c"}  # 'a' was upserted away from 'joins'
    hy = coll.hybrid("joins in spark", n_results=3)
    assert hy[0]["id"] == "c"

    # delete by id and by filter
    assert coll.delete("a") == 1
    assert coll.delete_by_filter({"lang": "fr"}) == 1
    assert coll.count() == 1
    assert coll.delete_by_filter({"lang": "nope"}) == 0

    assert client.delete_collection("kb") is True
    assert client.list_collections() == []
    with pytest.raises(ClientError):
        client.get_collection("kb")


def test_events_replay_over_sse(client):
    coll = client.create_collection("ev", dimensions=64)
    coll.add(ids=["1"], documents=["first"])
    coll.delete("1")
    seen = []
    for ev in coll.events(replay=10, timeout=3.0):
        seen.append(ev)
        if len(seen) >= 3:
            break
    types = [e["event_type"] for e in seen]
    assert types[:3] == ["create_collection", "add", "delete"]
    assert seen[1]["ids"] == ["1"]


@pytest.fixture()
def vclient(spark, tmp_path):
    srv, port = serve_background(VectorDB(spark, str(tmp_path / "vwh"), versioned=True))
    yield Client(f"http://127.0.0.1:{port}")
    srv.shutdown()


def test_versioned_admin_over_http(vclient):
    c = vclient.create_collection("docs", dimensions=64)
    c.add(ids=["a", "b", "c"], documents=["spark rows", "hash joins", "sort merge"])
    c.delete(["c"])

    hist = c.history()
    assert [m["version"] for m in hist] == list(range(len(hist)))
    assert hist[-1]["mode"] == "delete" and hist[-1]["n_deletes"] == 1

    # query while deletion vectors are active: served via the declarative
    # fallback, deleted id absent
    res = c.query(query_texts=["hash joins"], n_results=5)
    assert {h["id"] for h in res[0]} == {"a", "b"}

    v = c.optimize()
    assert v == len(hist)  # optimize committed the next version
    assert c.history()[-1]["mode"] == "optimize"
    assert c.history()[-1]["n_deletes"] == 0

    d = c.clone("docs2")
    assert d.count() == 2
    assert "docs2" in vclient.list_collections()
    # clones evolve independently
    d.delete(["a"])
    assert d.count() == 1 and c.count() == 2

    # MERGE over HTTP: update one row, insert one row
    v = c.merge([{"id": "a", "document": "spark rows UPDATED"},
                 {"id": "z", "document": "brand new"}])
    assert v == c.history()[-1]["version"]
    assert c.history()[-1]["mode"] == "merge"
    assert c.count() == 3
    assert c.get("a")["_document"] == "spark rows UPDATED"
    assert c.get("z")["_document"] == "brand new"

    # change feed over HTTP across the merge commit
    changes = {(r["id"], r["_change"]) for r in c.diff(v - 1, v)}
    assert changes == {("a", "update_postimage"), ("z", "insert")}


def test_admin_routes_reject_unversioned(client):
    client.create_collection("plain", dimensions=64)
    col = client.get_collection("plain")
    with pytest.raises(ClientError):
        col.history()
    with pytest.raises(ClientError):
        col.optimize()


def test_time_travel_peek_over_http(vclient):
    c = vclient.create_collection("tt", dimensions=64)
    c.add(ids=["a"], documents=["first doc"])
    c.add(ids=["b"], documents=["second doc"])
    hist = c.history()
    cur = {r["id"] for r in c.peek()}
    assert cur == {"a", "b"}
    # pin the version committed by the FIRST add: only "a" exists there
    past = {r["id"] for r in c.peek(version=hist[-2]["version"])}
    assert past == {"a"}
    with pytest.raises(ClientError):
        c.peek(version=999)


def test_reset_drops_all_collections(client):
    """Client.reset parity (fastpyvectordb/client.py:698-708): create →
    reset → list == []; destructive, idempotent on an empty DB."""
    client.create_collection("one", dimensions=64)
    client.create_collection("two", dimensions=64)
    assert sorted(client.list_collections()) == ["one", "two"]
    assert client.reset() is True
    assert client.list_collections() == []
    assert client.reset() is True  # empty reset is fine
