"""Embedded wire broker: the Kafka integration path exercised WITHOUT a
broker binary (round 12, VERDICT r11 task 2).

``parse_kafka_events`` (events.py) landed in r9 with the payload contract
of the reference's bus (``realtime.py:69-118``: JSON change events,
subscription filters, bounded replay), but until now nothing ever DROVE
that wire schema source-to-sink — the projection was only unit-tested on
a synthesized DataFrame. This module closes the gap in-process:

- :class:`EmbeddedWireBroker` — a tiny threaded TCP server that retains a
  bounded log of newline-delimited JSON wire payloads (exactly the bytes
  a Kafka ``value`` column would hold) and, per subscriber connection,
  replays the retained log from the beginning then streams live appends.
  That is the ``startingOffsets=earliest`` contract plus Kafka's bounded
  retention, and simultaneously the reference bus's replay-for-late-
  joiners semantics (``realtime.py:132-137``).
- :func:`read_event_stream_wire` — Spark's ``socket`` streaming source
  pointed at the broker, re-shaped to Kafka's fixed columns and fed
  through the SAME ``parse_kafka_events`` projection a production Kafka
  reader uses. Everything downstream (subscription filters, windows,
  stateful ops, warehouse ingest) is source-agnostic from here.

Scale note: the socket source is single-connection and not replayable —
it is Spark's integration-test source and that is precisely the role it
plays here. A production deployment swaps ``read_event_stream_kafka``
in; the wire payload, the projection, and every operator behind them are
shared verbatim, which is what this harness proves.
"""

from __future__ import annotations

import json
import socket
import threading
from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EmbeddedWireBroker:
    """Threaded TCP pub/sub speaking newline-delimited JSON wire events.

    ``publish`` appends to a bounded retained log (``retention`` newest
    records, Kafka's size-bounded topic analog / the reference bus's
    bounded history buffer) and pushes to every live subscriber; each new
    subscriber first receives the full retained log (earliest-offset
    replay), so events published before a streaming query starts still
    reach it."""

    def __init__(self, retention: int = 10_000):
        self._log: deque[bytes] = deque(maxlen=retention)
        self._clients: list[socket.socket] = []
        self._lock = threading.Lock()
        self._srv = socket.create_server(("127.0.0.1", 0))
        self._srv.settimeout(0.2)
        self.port = self._srv.getsockname()[1]
        self._closing = False
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        while not self._closing:
            try:
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            with self._lock:
                # replay-then-live under the publish lock: no event can
                # land between the snapshot and registration, so a
                # subscriber sees every event exactly once, in order
                for line in self._log:
                    try:
                        conn.sendall(line)
                    except OSError:
                        conn.close()
                        break
                else:
                    self._clients.append(conn)

    def publish(self, event: dict) -> None:
        """Append one wire event (the JSON payload a Kafka producer would
        put in ``value``) to the retained log and push it to subscribers."""
        line = (json.dumps(event) + "\n").encode()
        with self._lock:
            self._log.append(line)
            dead = []
            for c in self._clients:
                try:
                    c.sendall(line)
                except OSError:
                    dead.append(c)
            for c in dead:
                self._clients.remove(c)
                c.close()

    def publish_change(
        self,
        event_id: int,
        ts_us: int,
        user_id: int,
        event_type: str,
        value: float = 0.0,
        props: dict | None = None,
    ) -> None:
        """Convenience: one change event in the canonical wire schema
        (the ``parse_kafka_events`` payload contract)."""
        self.publish(
            {
                "event_id": event_id,
                "ts_us": ts_us,
                "user_id": user_id,
                "event_type": event_type,
                "value": value,
                "props": json.dumps(props or {}),
            }
        )

    def close(self) -> None:
        self._closing = True
        try:
            self._srv.close()
        finally:
            with self._lock:
                for c in self._clients:
                    c.close()
                self._clients.clear()
        self._thread.join(timeout=2.0)


def read_event_stream_wire(
    spark: SparkSession, host: str, port: int, topic: str = "events"
) -> DataFrame:
    """Socket-source stream off an :class:`EmbeddedWireBroker`, re-shaped
    to Kafka's fixed columns and parsed by the production projection.

    The socket source yields ``value: string`` lines; the select below
    reconstructs the Kafka reader's shape (key/value BINARY + topic /
    partition / offset bookkeeping columns) so ``parse_kafka_events`` is
    exercised byte-for-byte as a real broker would feed it."""
    from custom_python_vectordb_spark.streaming.events import parse_kafka_events

    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    kafka_shaped = raw.select(
        F.lit(None).cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.lit(0).alias("partition"),
        # the socket source has no offset bookkeeping (that's WHY it's the
        # test source); -1 keeps Kafka's column shape without inventing one
        F.lit(-1).cast("long").alias("offset"),
    )
    return parse_kafka_events(kafka_shaped)
