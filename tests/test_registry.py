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
    for name, sql in registry.resolved_oracles().items():
        assert "SELECT" in sql.upper(), name
        assert len(sql.strip()) > 20, name


def test_weak_queries_are_the_documented_set():
    # round 5 closed the last three rows-only checks with frozen-snapshot
    # oracles (_partitioned_snapshot / _media_snapshot): every registered
    # query now carries an oracle — the weak set must stay EMPTY
    weak = set(registry.QUERIES) - set(registry.ORACLES)
    assert weak == set(), weak


def test_contract_size_exact():
    # Pin the full contract: a broken import now raises in load_all, and this
    # guards against a module silently registering fewer queries.  Bump the
    # numbers when adding queries — never let them shrink.
    assert len(registry.QUERIES) >= 197
    assert len(registry.ORACLES) >= 197


def test_rotation_puts_unverified_oracleable_first():
    """The driver checks a fixed-size PREFIX of the registry each round, so
    the prefix must be: unverified+oracle-able queries first, then unverified
    oracle-less, then everything already verified.  Derived from the recorded
    CORRECTNESS files so the test stays true as rounds accumulate."""
    names = list(registry.QUERIES)
    verified = registry._already_verified()
    unverified_oracleable = [
        n for n in names if n not in verified and n in registry.ORACLES
    ]
    unverified_weak = [
        n for n in names if n not in verified and n not in registry.ORACLES
    ]
    k = len(unverified_oracleable)
    assert names[:k] == unverified_oracleable
    assert names[k : k + len(unverified_weak)] == unverified_weak
    # every remaining name is verified
    assert all(n in verified for n in names[k + len(unverified_weak) :])


def test_already_verified_requires_hash_green(tmp_path, monkeypatch):
    """A hash MISMATCH row must never count as verified (it is a failing
    query that needs to stay in the window); rows_match alone counts only
    when no hash was recorded. The value is the LATEST green round, so the
    rotation can order the verified tail stalest-first."""
    import json

    rows = {
        "hash_green": {"err": None, "rows_match": True, "hash_match": True},
        "hash_red": {"err": None, "rows_match": True, "hash_match": False},
        "rows_only": {"err": None, "rows_match": True, "hash_match": None},
        "no_oracle": {"err": "no_oracle", "rows_match": None, "hash_match": None},
        "errored": {"err": "boom", "rows_match": True, "hash_match": True},
    }
    pkg = tmp_path / "custom_python_vectordb_spark"
    pkg.mkdir()
    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps({"hash_green": rows["hash_green"]})
    )
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(rows))
    monkeypatch.setattr(
        registry, "__file__", str(pkg / "registry.py"), raising=False
    )
    assert registry._already_verified() == {"hash_green": 99, "rows_only": 99}


def test_catalog_and_view_memoization(spark, sf_small):
    """load_table and the graph views return the SAME DataFrame object for
    the same (session, sf_dir, table) — the plan-build latency fix — and
    distinct objects for distinct scale dirs."""
    from custom_python_vectordb_spark.sources.catalog import load_table
    from custom_python_vectordb_spark.sources.graph_view import edges_df, nodes_df

    assert load_table(spark, sf_small, "orders") is load_table(spark, sf_small, "orders")
    assert nodes_df(spark, sf_small) is nodes_df(spark, sf_small)
    assert edges_df(spark, sf_small) is edges_df(spark, sf_small)
    other = "/root/testdata/sf0.01"
    assert load_table(spark, other, "orders") is not load_table(spark, sf_small, "orders")


def test_scale_snapshot_fixtures_match_recompute(spark):
    """The per-scale parquet snapshot oracles (r10) must equal a fresh
    recompute — pins fixture drift (Spark/NumPy version, testdata regen)
    in pytest before it can fail the sweep. Cheap queries only; the heavy
    ones are covered by the committed CHECK artifacts. Floats compare via
    the same tolerance comparator the sweep uses (tools/check.py, r12):
    a fixture is the engine's own prior output, and a fresh container's
    BLAS can flip the last ulp exactly on a rounding boundary
    (media_features doc 668, −0.240894 vs −0.240895) without anything
    being wrong."""
    import sys

    import duckdb

    from custom_python_vectordb_spark import registry

    sys.path.insert(0, "/root/repo/tools")
    from check import pinned_values_equal

    registry.load_all()
    for name in ("embed_mock", "bpe_train_merges", "media_features"):
        for sf in ("sf0.1", "sf0.001"):
            sql = registry.resolve_scale_oracle(name, sf)
            assert sql is not None, (name, sf)
            frozen = [tuple(r) for r in duckdb.sql(sql).fetchall()]
            df = registry.QUERIES[name](spark, f"/root/testdata/{sf}")
            fresh = [tuple(r) for r in df.collect()]
            cols = list(df.columns)
            assert pinned_values_equal(frozen, cols, fresh, cols), (name, sf)


def test_pinned_tolerance_compare():
    """r12 (VERDICT r11 task 4): fixture comparison for pinned rows is
    tolerance-based — a last-ulp float drift (the r11 media_features
    re-freeze class) passes, a real value change fails, and non-float
    fields stay strict."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("check_tool", "/root/repo/tools/check.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    eq = mod.pinned_values_equal

    cols = ["doc_id", "f0"]
    base = [(668, -0.240894), (1, 0.5)]
    # the exact r11 flip: 6th-decimal boundary ulp drift -> equal now
    assert eq(base, cols, [(668, -0.240895), (1, 0.5)], cols)
    # real regression (drift far beyond ulp) -> still caught
    assert not eq(base, cols, [(668, -0.2415), (1, 0.5)], cols)
    # non-float fields strict; row order irrelevant; column order by name
    assert eq(base, cols, [(0.5, 1), (-0.2408941, 668)], ["f0", "doc_id"])
    assert not eq(base, cols, [(669, -0.240894), (1, 0.5)], cols)
    # nested arrays flatten; NaN == NaN; None strict
    assert eq([(1, [0.1, float("nan")])], cols, [(1, [0.10004, float("nan")])], cols)
    assert not eq([(1, None)], cols, [(1, 0.0)], cols)
    assert not eq(base, cols, base[:1], cols)
