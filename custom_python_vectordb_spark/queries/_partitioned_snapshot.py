"""Frozen partition-local-ANN snapshot at sf0.01 (round 5).

`knn_partitioned` is approximate (no engine-independent SQL statement)
but bit-DETERMINISTIC: modulo sharding pins partition membership,
k-means seeds from the lowest-id rows, and every float op is fixed-order
float64 — verified identical across runs and session configs
(tests/test_partitioned.py). That makes the sf0.01 result freezable as
an oracle literal, upgrading the last two rows-only driver checks to
hash-checked ones (the pq_kmeans_recall pattern,
queries/_pq_snapshot.py). tests/test_partitioned.py recomputes both and
asserts equality, so drift (Spark/NumPy version, fixture regeneration)
fails pytest before it can fail the driver gate.
"""

KNN_PARTITIONED_ROWS_SF001 = [(0, 0, 0.0), (0, 365, 0.630006), (0, 334, 0.637278), (0, 387, 0.668861), (0, 423, 0.703066), (0, 73, 0.704566), (0, 7, 0.707158), (0, 320, 0.712139), (0, 190, 0.718205), (0, 464, 0.723372), (1, 1, 0.0), (1, 386, 0.628515), (1, 27, 0.651792), (1, 407, 0.67299), (1, 195, 0.677256), (1, 64, 0.683626), (1, 124, 0.69725), (1, 402, 0.707678), (1, 472, 0.707891), (1, 220, 0.710218), (2, 2, 0.0), (2, 117, 0.681857), (2, 450, 0.733656), (2, 145, 0.736506), (2, 188, 0.736728), (2, 320, 0.744957), (2, 418, 0.745971), (2, 471, 0.752807), (2, 112, 0.754689), (2, 350, 0.759931), (3, 3, 0.0), (3, 130, 0.600128), (3, 149, 0.670066), (3, 343, 0.691528), (3, 174, 0.696452), (3, 231, 0.701212), (3, 207, 0.708298), (3, 192, 0.709197), (3, 315, 0.714808), (3, 437, 0.719465), (4, 4, 0.0), (4, 114, 0.601487), (4, 496, 0.658788), (4, 408, 0.677247), (4, 482, 0.686103), (4, 280, 0.720174), (4, 249, 0.720369), (4, 257, 0.727601), (4, 89, 0.734036), (4, 470, 0.747463)]

RECALL_SF001 = 1.0


def knn_partitioned_oracle_sql() -> str:
    values = ", ".join(
        "(%d, %d, %s)" % (q, v, repr(d)) for q, v, d in KNN_PARTITIONED_ROWS_SF001
    )
    return (
        "SELECT qid, vec_id, ROUND(CAST(dist AS DOUBLE), 6) + 0.0 AS dist FROM (VALUES "
        + values
        + ") AS t(qid, vec_id, dist) ORDER BY qid, dist, vec_id"
    )


def recall_oracle_sql() -> str:
    return "SELECT ROUND(CAST(%s AS DOUBLE), 6) + 0.0 AS avg_recall" % repr(RECALL_SF001)
