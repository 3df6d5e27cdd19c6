"""Minimal REST + SSE serving layer over VectorDB (SURVEY.md §2.1 S10, R1-R4).

The reference ships FastAPI servers (``server.py:182-438``,
``server_full.py:201-722``) that delegate to the engine; this is the same
delegation surface on the stdlib HTTP server (FastAPI isn't in this
runtime), so a reference user's REST workflow ports 1:1:

    GET    /collections                     list
    POST   /collections                     {"name", "dimensions"}
    DELETE /collections/<name>
    GET    /collections/<name>/count
    POST   /collections/<name>/add          {"ids", "documents"}
    POST   /collections/<name>/query        {"query_texts"|"query_embeddings",
                                             "n_results", "where"}
    GET    /collections/<name>/events       Server-Sent-Events push stream
           ?types=add,delete&replay=N       (live mutations + ring replay)

The events stream carries the reference's realtime subscription semantics
(``realtime.py:449-510``: subscribe with event-type filter, receive pushed
mutation events, replay up to N missed events on connect) over SSE — the
stdlib-compatible cousin of its WebSocket (same one-directional push; WS
adds client→server messaging the reference only uses for the subscribe
handshake, which SSE moves into the query string).

Serving is driver-side by construction (queries are collect()ed to JSON) —
the engine behind it is the same cluster-scale plans; a production
deployment would put this behind Spark Connect instead of one driver.
"""

from __future__ import annotations

import json
import queue as _queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from custom_python_vectordb_spark.api import VectorDB


class EventBus:
    """In-process pub/sub with bounded replay, mirroring the reference's
    EventBus + ring history (``realtime.py:132-159``): publishers append to
    a ring buffer and fan out to subscriber queues; a subscriber may ask
    for the last N events on connect (replay), then receives live pushes.
    """

    def __init__(self, history: int = 1000):
        self._ring: deque[dict] = deque(maxlen=history)
        self._subs: dict[int, _queue.Queue] = {}
        self._lock = threading.Lock()
        self._next_id = 0
        self._seq = 0

    def publish(self, event: dict) -> dict:
        with self._lock:
            self._seq += 1
            event = {"seq": self._seq, "ts": time.time(), **event}
            self._ring.append(event)
            queues = list(self._subs.values())
        for q in queues:
            q.put(event)
        return event

    def subscribe(self, replay: int = 0) -> tuple[int, _queue.Queue, list[dict]]:
        """Returns (subscriber id, live queue, replayed events). Replay and
        registration are atomic, so no event is missed or duplicated
        between the ring snapshot and the first live push."""
        q: _queue.Queue = _queue.Queue()
        with self._lock:
            sid = self._next_id
            self._next_id += 1
            self._subs[sid] = q
            replayed = list(self._ring)[-replay:] if replay > 0 else []
        return sid, q, replayed

    def unsubscribe(self, sid: int) -> None:
        with self._lock:
            self._subs.pop(sid, None)


def _routes(db: VectorDB, bus: EventBus | None = None):
    def publish(collection: str, event_type: str, **data):
        if bus is not None:
            bus.publish({"collection": collection, "event_type": event_type, **data})

    def handle(method: str, path: str, body: dict):
        parts = [p for p in path.split("/") if p]
        if parts == ["collections"]:
            if method == "GET":
                return 200, {"collections": db.list_collections()}
            if method == "POST":
                db.create_collection(body["name"], int(body.get("dimensions", 64)))
                publish(body["name"], "create_collection")
                return 201, {"created": body["name"]}
        if len(parts) >= 2 and parts[0] == "collections":
            name = parts[1]
            if len(parts) == 2 and method == "DELETE":
                deleted = db.delete_collection(name)
                publish(name, "drop_collection")
                return 200, {"deleted": deleted}
            if not db.warehouse.exists(name):
                return 404, {"error": f"collection {name!r} not found"}
            coll = db.get_collection(name)
            if parts[2:] == ["count"] and method == "GET":
                return 200, {"count": coll.count()}
            if parts[2:] == ["add"] and method == "POST":
                pairs = list(zip(body["ids"], body["documents"]))
                coll.add_texts(pairs)
                publish(name, "add", ids=list(body["ids"]))
                return 201, {"added": len(pairs)}
            if parts[2:] == ["query"] and method == "POST":
                rows = coll.query(
                    query_texts=body.get("query_texts"),
                    query_embeddings=body.get("query_embeddings"),
                    n_results=int(body.get("n_results", 10)),
                    where=body.get("where"),
                ).collect()
                out: dict[int, list] = {}
                for r in rows:
                    out.setdefault(int(r["qid"]), []).append(
                        {"id": r["id"], "dist": float(r["dist"])}
                    )
                # positional contract: results[i] ↔ input query i, so a query
                # whose filter matches nothing still gets an (empty) slot
                n_queries = len(body.get("query_texts") or body.get("query_embeddings") or [])
                return 200, {"results": [out.get(i, []) for i in range(n_queries)]}
            if len(parts) == 4 and parts[2] == "get" and method == "GET":
                doc = coll.get(parts[3])
                return (200, doc) if doc is not None else (404, {"error": f"id {parts[3]!r} not found"})
            if parts[2:] == ["delete"] and method == "POST":
                coll.delete(list(body["ids"]))
                publish(name, "delete", ids=list(body["ids"]))
                return 200, {"deleted": len(body["ids"])}
            if parts[2:] == ["keyword"] and method == "POST":
                rows = coll.keyword_search(body["query"], k=int(body.get("n_results", 10))).collect()
                return 200, {"results": [{"id": r["id"], "score": float(r["score"])} for r in rows]}
            if parts[2:] == ["hybrid"] and method == "POST":
                rows = coll.hybrid(
                    body["query"], k=int(body.get("n_results", 10)),
                    alpha=float(body.get("alpha", 0.5)),
                ).collect()
                return 200, {
                    "results": [
                        {"id": r["id"], "score": float(r["score"]),
                         "vector_score": float(r["vector_score"]),
                         "keyword_score": float(r["keyword_score"])}
                        for r in rows
                    ]
                }
        return 404, {"error": f"no route {method} {path}"}

    return handle


def make_server(db: VectorDB, port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the server; port 0 picks a free port. The server
    carries an EventBus (`srv.bus`) publishing every mutation route."""
    bus = EventBus()
    handle = _routes(db, bus)

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, method):
            try:
                length = int(self.headers.get("Content-Length") or 0)
                body = json.loads(self.rfile.read(length) or b"{}") if length else {}
                status, payload = handle(method, self.path, body)
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                status, payload = 400, {"error": str(e)}
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _sse(self):
            """GET /collections/<name>/events?types=a,b&replay=N — replay
            up to N buffered events matching the filter, then push live
            events until the client disconnects."""
            from urllib.parse import parse_qs, urlparse

            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            name = parts[1]
            qs = parse_qs(u.query)
            types = set(qs["types"][0].split(",")) if qs.get("types") else None
            replay = int(qs.get("replay", ["0"])[0])

            def wanted(ev):
                return ev.get("collection") == name and (types is None or ev.get("event_type") in types)

            sid, q, replayed = bus.subscribe(replay=replay)
            try:
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                for ev in replayed:
                    if wanted(ev):
                        self._send_event(ev, replayed=True)
                while True:
                    try:
                        ev = q.get(timeout=15.0)
                    except _queue.Empty:
                        self.wfile.write(b": keepalive\n\n")  # SSE comment
                        self.wfile.flush()
                        continue
                    if wanted(ev):
                        self._send_event(ev)
            except (BrokenPipeError, ConnectionResetError, OSError):
                pass  # client went away
            finally:
                bus.unsubscribe(sid)

        def _send_event(self, ev: dict, replayed: bool = False):
            payload = {**ev, **({"replayed": True} if replayed else {})}
            self.wfile.write(
                f"id: {ev['seq']}\ndata: {json.dumps(payload)}\n\n".encode()
            )
            self.wfile.flush()

        def do_GET(self):
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            if len(parts) == 3 and parts[0] == "collections" and parts[2] == "events":
                self._sse()
                return
            self._reply("GET")

        def do_POST(self):
            self._reply("POST")

        def do_DELETE(self):
            self._reply("DELETE")

        def log_message(self, *a):  # keep test output quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    srv.bus = bus  # exposed for embedding/tests
    return srv


def serve_background(db: VectorDB, port: int = 0) -> tuple[ThreadingHTTPServer, int]:
    """Start serving on a daemon thread; returns (server, bound_port)."""
    srv = make_server(db, port)
    srv.daemon_threads = True  # SSE handler threads must not block shutdown
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def main() -> None:
    """CLI: python -m custom_python_vectordb_spark.server <warehouse_dir> [port]"""
    import sys

    from custom_python_vectordb_spark.session import get_spark

    if len(sys.argv) < 2:
        print("usage: python -m custom_python_vectordb_spark.server <warehouse_dir> [port]")
        raise SystemExit(2)
    root = sys.argv[1]
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8765
    spark = get_spark("vectordb-server")
    spark.sparkContext.setLogLevel("ERROR")
    srv = make_server(VectorDB(spark, root), port)
    print(f"serving {root} on http://127.0.0.1:{srv.server_address[1]} — Ctrl-C to stop")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
