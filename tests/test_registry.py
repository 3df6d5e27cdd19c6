"""Registry invariants: the driver contract stays well-formed as queries
are added."""

from __future__ import annotations

import inspect

from custom_python_vectordb_spark import registry

registry.load_all()


def test_every_oracle_has_a_query():
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_query_callables_take_spark_and_sfdir():
    for name, fn in registry.QUERIES.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_names_are_snake_case():
    import re

    for name in registry.QUERIES:
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_oracle_sql_is_nonempty_and_selects():
    for name, sql in registry.ORACLES.items():
        assert "SELECT" in sql.upper(), name
        assert len(sql.strip()) > 20, name


def test_weak_queries_are_the_documented_set():
    weak = set(registry.QUERIES) - set(registry.ORACLES)
    assert weak == {
        "embed_mock",            # RandomState embeddings not SQL-expressible
        "pq_kmeans_recall",      # MLlib KMeans model metric
        "media_features",        # embedding-based feature stub
        "semantic_text_search",  # UDF embeddings end-to-end
        "mmr_rerank",            # iterative greedy argmax
        "knn_partitioned",       # approximate, partition-shaped result
        "recall_partitioned_vs_exact",  # model-quality metric
    }, weak


def test_contract_size_exact():
    # Pin the full contract: a broken import now raises in load_all, and this
    # guards against a module silently registering fewer queries.  Bump the
    # numbers when adding queries — never let them shrink.
    assert len(registry.QUERIES) >= 140
    assert len(registry.ORACLES) >= 133


def test_priority_rotation_applied():
    names = list(registry.QUERIES)
    expected_front = [n for n in registry.PRIORITY if n in registry.QUERIES]
    assert names[: len(expected_front)] == expected_front
    # the driver-checked window (first 50) should be exactly the rotation block
    assert len(expected_front) == 50
