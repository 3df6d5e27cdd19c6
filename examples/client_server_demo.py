"""Client↔server round-trip: the reference's remote workflow
(fastpyvectordb Client → FastAPI server) on this engine's stack
(client.Client → stdlib HTTP server → Spark plans).

    python examples/client_server_demo.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from custom_python_vectordb_spark.api import VectorDB
from custom_python_vectordb_spark.client import Client
from custom_python_vectordb_spark.server import serve_background
from custom_python_vectordb_spark.session import get_spark


def main() -> None:
    spark = get_spark("client-server-demo")
    with tempfile.TemporaryDirectory() as root:
        srv, port = serve_background(VectorDB(spark, root))
        client = Client(f"http://127.0.0.1:{port}")
        print("heartbeat:", client.heartbeat())

        coll = client.create_collection("articles", dimensions=64)
        coll.add(
            ids=["a1", "a2", "a3"],
            documents=[
                "spark shuffles data between stages",
                "broadcast joins avoid the shuffle",
                "foxes sleep through the afternoon",
            ],
            metadatas=[
                {"topic": "spark", "stars": 5},
                {"topic": "spark", "stars": 4},
                {"topic": "nature", "stars": 2},
            ],
        )
        print("count:", coll.count())

        hits = coll.query(
            query_texts=["how do shuffles work in spark"],
            n_results=2,
            where={"topic": "spark"},
        )
        print("query hits:", [(h["id"], round(h["dist"], 3)) for h in hits[0]])
        print("keyword:", [(h["id"], round(h["score"], 3)) for h in coll.keyword_search("shuffle")])

        print("deleted by filter:", coll.delete_by_filter({"topic": "nature"}))
        coll.upsert(ids=["a2"], documents=["rewritten: tuning shuffle partitions"],
                    metadatas=[{"topic": "spark"}])
        coll.update(ids=["a1"], metadatas=[{"stars": 3}])
        print("a1 after update:", {k: v for k, v in coll.get("a1").items() if k != "embedding"})
        print("peek:", [r["id"] for r in coll.peek(10)])

        # realtime: replay the mutation history over SSE
        events = []
        for ev in coll.events(replay=10, timeout=3.0):
            events.append(ev["event_type"])
            if len(events) >= 5:
                break
        print("event stream (replayed):", events)

        client.delete_collection("articles")
        srv.shutdown()
        print("done.")


if __name__ == "__main__":
    main()
