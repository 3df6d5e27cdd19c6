"""Minimal REST serving layer over VectorDB (SURVEY.md §2.1 S10).

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

Serving is driver-side by construction (queries are collect()ed to JSON) —
the engine behind it is the same cluster-scale plans; a production
deployment would put this behind Spark Connect instead of one driver.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from custom_python_vectordb_spark.api import VectorDB


def _routes(db: VectorDB):
    def handle(method: str, path: str, body: dict):
        parts = [p for p in path.split("/") if p]
        if parts == ["collections"]:
            if method == "GET":
                return 200, {"collections": db.list_collections()}
            if method == "POST":
                db.create_collection(body["name"], int(body.get("dimensions", 64)))
                return 201, {"created": body["name"]}
        if len(parts) >= 2 and parts[0] == "collections":
            name = parts[1]
            if len(parts) == 2 and method == "DELETE":
                return 200, {"deleted": db.delete_collection(name)}
            if not db.warehouse.exists(name):
                return 404, {"error": f"collection {name!r} not found"}
            coll = db.get_collection(name)
            if parts[2:] == ["count"] and method == "GET":
                return 200, {"count": coll.count()}
            if parts[2:] == ["add"] and method == "POST":
                pairs = list(zip(body["ids"], body["documents"]))
                coll.add_texts(pairs)
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
    """Build (not start) the server; port 0 picks a free port."""
    handle = _routes(db)

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

        def do_GET(self):
            self._reply("GET")

        def do_POST(self):
            self._reply("POST")

        def do_DELETE(self):
            self._reply("DELETE")

        def log_message(self, *a):  # keep test output quiet
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve_background(db: VectorDB, port: int = 0) -> tuple[ThreadingHTTPServer, int]:
    """Start serving on a daemon thread; returns (server, bound_port)."""
    srv = make_server(db, port)
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
