"""Versioned warehouse: manifest commits, time travel, append, races, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from custom_python_vectordb_spark.sources.versioned import (
    CommitConflict,
    VersionedWarehouse,
)


@pytest.fixture()
def wh(spark, tmp_path):
    return VersionedWarehouse(spark, str(tmp_path / "vwh"))


def _df(spark, ids):
    return spark.createDataFrame([(i, f"doc {i}") for i in ids], "id long, text string")


def test_create_overwrite_time_travel(spark, wh):
    assert wh.save("c", _df(spark, [1, 2, 3])) == 0
    assert wh.save("c", _df(spark, [4, 5])) == 1  # overwrite = new version
    assert wh.latest_version("c") == 1
    assert sorted(r["id"] for r in wh.load("c").collect()) == [4, 5]
    # time travel: version 0 still fully readable
    assert sorted(r["id"] for r in wh.load("c", version=0).collect()) == [1, 2, 3]
    hist = wh.history("c")
    assert [m["version"] for m in hist] == [0, 1]
    assert hist[1]["parent"] == 0 and hist[1]["mode"] == "overwrite"
    with pytest.raises(ValueError):
        wh.load("c", version=7)


def test_append_is_incremental(spark, wh):
    wh.save("c", _df(spark, [1, 2]))
    wh.save("c", _df(spark, [3]), mode="append")
    wh.save("c", _df(spark, [4]), mode="append")
    assert sorted(r["id"] for r in wh.load("c").collect()) == [1, 2, 3, 4]
    # appends reference parent dirs instead of rewriting them
    hist = wh.history("c")
    assert len(hist[2]["dirs"]) == 3
    assert hist[1]["dirs"][0] == hist[0]["dirs"][0]
    # intermediate version readable too
    assert sorted(r["id"] for r in wh.load("c", version=1).collect()) == [1, 2, 3]


def test_commit_race_retries_and_lands(spark, wh):
    wh.save("c", _df(spark, [1]))
    # simulate a rival writer stealing version 1 mid-commit
    rival = wh._manifest_path("c", 1)
    os.makedirs(os.path.dirname(rival), exist_ok=True)
    with open(rival, "x") as fh:
        json.dump({"version": 1, "parent": 0, "mode": "overwrite",
                   "dirs": wh._read_manifest("c", 0)["dirs"], "committed_at": 0}, fh)
    v = wh.save("c", _df(spark, [9]), mode="append")
    assert v == 2  # lost the race for 1, landed on 2
    # append re-read the NEW head, so the rival's rows are kept
    assert sorted(r["id"] for r in wh.load("c").collect()) == [1, 9]


def test_commit_conflict_exhausts(spark, tmp_path):
    # a writer whose head lookup is stale (object-store LIST lag) keeps
    # colliding with the same taken version and must give up loudly
    class StaleHead(VersionedWarehouse):
        def latest_version(self, name):
            v = super().latest_version(name)
            return None if v is None else 0

    wh = StaleHead(spark, str(tmp_path / "vwh"), max_retries=2)
    wh.save("c", _df(spark, [1]))
    with open(wh._manifest_path("c", 1), "x") as fh:  # rival owns v1
        json.dump({"version": 1, "parent": 0, "mode": "overwrite",
                   "dirs": wh._read_manifest("c", 0)["dirs"], "committed_at": 0}, fh)
    with pytest.raises(CommitConflict):
        wh.save("c", _df(spark, [2]))


def test_vacuum_keeps_recent_versions(spark, wh):
    wh.save("c", _df(spark, [1]))
    wh.save("c", _df(spark, [2]))
    wh.save("c", _df(spark, [3]))
    deleted = wh.vacuum("c", keep_last=2)
    assert len(deleted) == 1  # only version 0's dir was unreferenced
    assert sorted(r["id"] for r in wh.load("c").collect()) == [3]
    assert sorted(r["id"] for r in wh.load("c", version=1).collect()) == [2]
    # readers of the latest two versions unaffected; v0's data is gone
    with pytest.raises(Exception):
        wh.load("c", version=0).collect()


def test_vectordb_facade_on_versioned_store(spark, tmp_path):
    from custom_python_vectordb_spark.api import VectorDB

    db = VectorDB(spark, str(tmp_path / "vdb"), versioned=True)
    c = db.create_collection("docs", dimensions=64)
    c.add_texts([("d1", "spark shuffles data"), ("d2", "broadcast joins")])
    assert c.count() == 2
    hits = c.query(query_texts=["shuffle data"], n_results=1).collect()
    assert len(hits) == 1
    c.delete(ids=["d2"])
    assert c.count() == 1
    # every mutation committed a version; pre-delete state is still readable
    latest = db.warehouse.latest_version("docs")
    assert latest >= 2
    prev = db.warehouse.load("docs", version=latest - 1)
    assert prev.count() == 2
    assert db.delete_collection("docs") is True


def test_catalog_and_drop(spark, wh):
    wh.save("a", _df(spark, [1]))
    wh.save("b", _df(spark, [2]))
    assert wh.list_collections() == ["a", "b"]
    assert wh.exists("a") and not wh.exists("zz")
    assert wh.drop("a") is True
    assert wh.drop("a") is False
    assert wh.list_collections() == ["b"]
    with pytest.raises(FileNotFoundError):
        wh.load("a")


def test_optimize_compacts_and_clusters(spark, wh):
    import glob

    wh.save("c", _df(spark, [5, 1, 9]))
    wh.save("c", _df(spark, [2, 8]), mode="append")
    wh.save("c", _df(spark, [7, 3]), mode="append")
    pre_files = len(glob.glob(os.path.join(wh._data("c"), "*", "*.parquet")))
    v = wh.optimize("c", cluster_by=["id"])
    assert v == 3
    # contents identical, still time-travelable to pre-optimize
    assert sorted(r["id"] for r in wh.load("c").collect()) == [1, 2, 3, 5, 7, 8, 9]
    assert sorted(r["id"] for r in wh.load("c", version=2).collect()) == [1, 2, 3, 5, 7, 8, 9]
    # compacted to fewer files (tiny table → 1 target file), new dir only
    m = wh.history("c")[-1]
    assert m["mode"] == "optimize" and len(m["dirs"]) == 1 and m["cluster_by"] == ["id"]
    post_files = [
        f for d in m["dirs"]
        for f in glob.glob(os.path.join(wh._data("c"), d, "*.parquet"))
    ]
    assert len(post_files) == 1 < pre_files


def test_optimize_aborts_on_concurrent_commit(spark, wh, monkeypatch):
    wh.save("c", _df(spark, [1, 2]))
    # simulate a racing writer landing between snapshot-read and commit
    orig = VersionedWarehouse._read_manifest

    def hijack(self, name, version):
        m = orig(self, name, version)
        if not getattr(hijack, "fired", False):
            hijack.fired = True
            wh2 = VersionedWarehouse(spark, self.root)
            wh2.save(name, _df(spark, [99]), mode="append")
        return m

    monkeypatch.setattr(VersionedWarehouse, "_read_manifest", hijack)
    with pytest.raises(CommitConflict):
        wh.optimize("c")
    monkeypatch.undo()
    # the concurrent append is intact; no staged garbage is referenced
    assert sorted(r["id"] for r in wh.load("c").collect()) == [1, 2, 99]


def test_shard_paths_track_snapshot(spark, wh):
    """shard_paths must expand exactly the pinned manifest's files: the
    latest snapshot excludes superseded versions' files, and time travel
    returns the old set."""
    df1 = spark.range(5).selectExpr("cast(id as string) id", "id * 1.0 v")
    v0 = wh.save("t", df1)
    p0 = wh.shard_paths("t")
    assert p0 and all(f.endswith(".parquet") for f in p0)
    df2 = spark.range(8).selectExpr("cast(id as string) id", "id * 2.0 v")
    v1 = wh.save("t", df2, mode="overwrite")
    p1 = wh.shard_paths("t")
    assert set(p1).isdisjoint(p0)  # overwrite = all-new dirs
    assert wh.shard_paths("t", version=v0) == p0
    import pyarrow.parquet as pq
    rows = sum(pq.read_table(p).num_rows for p in p1)
    assert rows == 8


def test_optimize_zorder_clusters_both_columns(spark, wh):
    """OPTIMIZE ZORDER BY: after rewriting on the Morton interleave of two
    independent columns, per-file [min,max] is narrow on BOTH (a
    lexicographic sort would leave the second full-width), data and time
    travel are untouched, and the manifest records the clustering."""
    from pyspark.sql import functions as F

    from custom_python_vectordb_spark.operators.zorder import file_minmax

    df = spark.range(4096).select(
        F.col("id"),
        (F.col("id") % 64).alias("x"),
        F.floor(F.col("id") / 64).cast("long").alias("y"),
    )
    wh.save("z", df.orderBy(F.xxhash64("id")))  # shuffled layout
    v = wh.optimize("z", zorder_by=["x", "y"], target_file_mb=0.001)
    assert v == 1
    m = wh.history("z")[-1]
    assert m["mode"] == "optimize" and m["zorder_by"] == ["x", "y"]

    data_dir = os.path.join(wh._data("z"), m["dirs"][0])
    mm = file_minmax(spark, data_dir, ["x", "y"]).collect()
    assert len(mm) >= 4
    for col in ("x", "y"):
        avg_span = sum(r[f"max_{col}"] - r[f"min_{col}"] + 1 for r in mm) / len(mm)
        assert avg_span < 0.5 * 64, (col, avg_span)

    assert wh.load("z").count() == 4096
    assert sorted(r["id"] for r in wh.load("z").collect()) == list(range(4096))
    assert wh.load("z", version=0).count() == 4096


def test_optimize_rejects_both_cluster_specs(spark, wh):
    wh.save("c2", _df(spark, [1, 2]))
    with pytest.raises(ValueError, match="not both"):
        wh.optimize("c2", cluster_by=["id"], zorder_by=["id", "id"])


def test_delete_where_is_o_delta_and_time_travels(spark, wh):
    from pyspark.sql import functions as F

    wh.save("c", _df(spark, range(10)))
    v1 = wh.delete_where("c", F.col("id") >= 7, key_col="id")
    assert v1 == 1
    assert sorted(r["id"] for r in wh.load("c").collect()) == list(range(7))
    # time travel: pre-delete version still sees every row
    assert sorted(r["id"] for r in wh.load("c", version=0).collect()) == list(range(10))
    # the delete commit staged only keys, not a data rewrite
    m = wh.history("c")[-1]
    assert m["mode"] == "delete" and len(m["deletes"]) == 1 and m["delete_key"] == "id"
    assert m["dirs"] == wh.history("c")[0]["dirs"]

    # appends inherit the deletion vector
    wh.save("c", _df(spark, [20, 21]), mode="append")
    assert sorted(r["id"] for r in wh.load("c").collect()) == list(range(7)) + [20, 21]

    # raw shard serving refuses while deletes are active
    with pytest.raises(RuntimeError, match="deletion vectors"):
        wh.shard_paths("c")

    # optimize materializes: same rows, deletes cleared, shards servable
    before = sorted(r["id"] for r in wh.load("c").collect())
    wh.optimize("c")
    assert sorted(r["id"] for r in wh.load("c").collect()) == before
    assert wh.history("c")[-1]["deletes"] == []
    assert wh.shard_paths("c")


def test_delete_where_aborts_on_race(spark, wh, monkeypatch):
    from pyspark.sql import functions as F

    wh.save("c", _df(spark, range(5)))
    # simulate a racing writer landing between snapshot-read and commit
    orig = VersionedWarehouse._read_manifest

    def hijack(self, name, version):
        m = orig(self, name, version)
        if not getattr(hijack, "fired", False):
            hijack.fired = True
            wh2 = VersionedWarehouse(spark, self.root)
            wh2.save(name, _df(spark, [99]), mode="append")
        return m

    monkeypatch.setattr(VersionedWarehouse, "_read_manifest", hijack)
    with pytest.raises(CommitConflict):
        wh.delete_where("c", F.col("id") >= 3, key_col="id")
    monkeypatch.undo()
    # the concurrent append is intact and no delete was applied
    assert sorted(r["id"] for r in wh.load("c").collect()) == [0, 1, 2, 3, 4, 99]


def test_shallow_clone_is_zero_copy_and_independent(spark, wh):
    from pyspark.sql import functions as F

    wh.save("src", _df(spark, range(6)))
    wh.save("src", _df(spark, [10, 11]), mode="append")
    assert wh.clone("src", "dst") == 0
    assert sorted(r["id"] for r in wh.load("dst").collect()) == [0, 1, 2, 3, 4, 5, 10, 11]
    # zero-copy: dst's own data dir holds nothing
    assert os.listdir(wh._data("dst")) == []

    # independent evolution: writes to one never show in the other
    wh.save("dst", _df(spark, [99]), mode="append")
    wh.delete_where("dst", F.col("id") == 0, key_col="id")
    assert sorted(r["id"] for r in wh.load("dst").collect()) == [1, 2, 3, 4, 5, 10, 11, 99]
    assert sorted(r["id"] for r in wh.load("src").collect()) == [0, 1, 2, 3, 4, 5, 10, 11]

    # cloning at a pinned version
    wh.clone("src", "dst0", version=0)
    assert sorted(r["id"] for r in wh.load("dst0").collect()) == [0, 1, 2, 3, 4, 5]
    with pytest.raises(FileExistsError):
        wh.clone("src", "dst")


def test_clone_carries_deletion_vectors(spark, wh):
    from pyspark.sql import functions as F

    wh.save("src", _df(spark, range(6)))
    wh.delete_where("src", F.col("id") < 2, key_col="id")
    wh.clone("src", "d2")
    assert sorted(r["id"] for r in wh.load("d2").collect()) == [2, 3, 4, 5]
    # materializing in the clone stays local to the clone
    wh.optimize("d2")
    assert sorted(r["id"] for r in wh.load("d2").collect()) == [2, 3, 4, 5]
    assert sorted(r["id"] for r in wh.load("src").collect()) == [2, 3, 4, 5]
    assert sorted(r["id"] for r in wh.load("src", version=0).collect()) == list(range(6))


def test_facade_delete_uses_deletion_vectors_and_serving_falls_back(spark, tmp_path):
    from custom_python_vectordb_spark.api import VectorDB

    db = VectorDB(spark, str(tmp_path / "vdb2"), versioned=True)
    c = db.create_collection("docs", dimensions=64)
    c.add_texts([(f"d{i}", f"document number {i} about spark") for i in range(8)])
    v_before = db.warehouse.latest_version("docs")
    c.delete(ids=["d3", "d5"])
    # O(delta): the delete committed a deletion vector, not a rewrite
    m = db.warehouse.history("docs")[-1]
    assert m["mode"] == "delete" and m["delete_key"] == "id"
    assert db.warehouse.latest_version("docs") == v_before + 1
    assert c.count() == 6

    # serving falls back to the declarative plan while vectors are active
    served = c.query_serve(query_texts=["document about spark"], n_results=8)
    ids = {h["id"] for h in served[0]}
    assert ids == {f"d{i}" for i in range(8)} - {"d3", "d5"}
    planned = c.query(query_texts=["document about spark"], n_results=8).collect()
    assert [h["id"] for h in served[0]] == [r["id"] for r in planned]

    # an insert materializes the deletes; the replica fast path resumes
    c.insert_batch(
        spark.createDataFrame(
            [("d9", [0.1] * 64, "late doc")], "id string, embedding array<float>, _document string"
        )
    )
    assert db.warehouse.history("docs")[-1]["deletes"] == []
    served2 = c.query_serve(query_texts=["document about spark"], n_results=9)
    assert {h["id"] for h in served2[0]} == ({f"d{i}" for i in range(8)} - {"d3", "d5"}) | {"d9"}

    # delete_by_filter goes through the same vector path
    from pyspark.sql import functions as F

    c.delete_by_filter(F.col("id") == "d9")
    assert db.warehouse.history("docs")[-1]["mode"] == "delete"
    assert c.count() == 6


def test_manifest_stats_prune_dirs(spark, wh):
    """Range-disjoint appends with stats_cols: scan_pruned must plan only
    the dirs whose manifest [min,max] intersects the range — verified via
    inputFiles(), with row-identical results to a full-scan filter."""
    from pyspark.sql import functions as F

    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(lo + i, f"r{lo + i}") for i in range(50)], "id long, text string"
        )
        wh.save("t", df, mode="append" if lo else "overwrite", stats_cols=["id"])

    m = wh.history("t")[-1]
    assert len(m["dirs"]) == 3 and set(m["stats"]) == set(m["dirs"])
    assert all(s["rows"] == 50 for s in m["stats"].values())

    pruned = wh.scan_pruned("t", "id", 120, 140)
    full = wh.load("t").filter(F.col("id").between(120, 140))
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    )
    # exactly one dir's files were planned
    pruned_dirs = {p.rsplit("/", 2)[-2] for p in pruned.inputFiles()}
    assert len(pruned_dirs) == 1
    assert len({p.rsplit("/", 2)[-2] for p in wh.load("t").inputFiles()}) == 3

    # out-of-range: empty result, empty file plan
    none = wh.scan_pruned("t", "id", 900, 999)
    assert none.count() == 0

    # deletes are honored through the pruned path
    wh.delete_where("t", F.col("id") == 125, key_col="id")
    got = sorted(r["id"] for r in wh.scan_pruned("t", "id", 120, 140).collect())
    assert got == [i for i in range(120, 141) if i != 125]

    # optimize recomputes stats for the compacted dir on the tracked column
    wh.optimize("t", cluster_by=["id"])
    m2 = wh.history("t")[-1]
    assert list(m2["stats"].values())[0]["cols"]["id"] == [0, 249]


def test_clone_carries_manifest_stats(spark, wh):
    from pyspark.sql import functions as F

    wh.save("s", spark.createDataFrame([(i, "x") for i in range(20)], "id long, t string"),
            stats_cols=["id"])
    wh.save("s", spark.createDataFrame([(100 + i, "y") for i in range(20)], "id long, t string"),
            mode="append", stats_cols=["id"])
    wh.clone("s", "sc")
    pruned = wh.scan_pruned("sc", "id", 0, 50)
    assert sorted(r["id"] for r in pruned.collect()) == list(range(20))
    assert len({p.rsplit("/", 2)[-2] for p in pruned.inputFiles()}) == 1


def test_events_range_pruned_query_skips_dirs(spark):
    """The registered events_range_pruned query must actually prune: its
    manifest-pruned scan plans a strict subset of the full snapshot's
    dirs for the [2000, 2999] id range."""
    from custom_python_vectordb_spark.queries.analytics import _events_vstore

    sf = "/root/testdata/sf0.01"
    wh = _events_vstore(spark, sf)
    pruned_dirs = {
        p.rsplit("/", 2)[-2]
        for p in wh.scan_pruned("events", "event_id", 2000, 2999).inputFiles()
    }
    all_dirs = {p.rsplit("/", 2)[-2] for p in wh.load("events").inputFiles()}
    assert len(all_dirs) == 3
    assert pruned_dirs < all_dirs and len(pruned_dirs) == 1


def test_merge_into_update_insert_delete(spark, wh):
    """MERGE semantics: matched rows updated (or deleted), unmatched source
    rows inserted (or skipped); pre-merge versions still time-travel."""
    wh.save("m", _df(spark, [1, 2, 3]), stats_cols=["id"])
    src = spark.createDataFrame(
        [(2, "UPDATED 2"), (9, "NEW 9")], "id long, text string"
    )
    v = wh.merge_into("m", src, "id", stats_cols=["id"])
    got = {r["id"]: r["text"] for r in wh.load("m").collect()}
    assert got == {1: "doc 1", 2: "UPDATED 2", 3: "doc 3", 9: "NEW 9"}
    # pre-merge snapshot untouched
    old = {r["id"]: r["text"] for r in wh.load("m", version=v - 1).collect()}
    assert old == {1: "doc 1", 2: "doc 2", 3: "doc 3"}
    # matched-delete + skip-insert
    src2 = spark.createDataFrame([(1, "x"), (77, "x")], "id long, text string")
    wh.merge_into("m", src2, "id", when_matched="delete", when_not_matched="skip")
    got = {r["id"]: r["text"] for r in wh.load("m").collect()}
    assert got == {2: "UPDATED 2", 3: "doc 3", 9: "NEW 9"}
    with pytest.raises(ValueError, match="when_matched"):
        wh.merge_into("m", src2, "id", when_matched="upsert")


def test_merge_into_prunes_untouched_dirs(spark, wh):
    """Range-disjoint appends + a merge touching only the last range: the
    earlier dirs must be carried BY REFERENCE (same dir names in the new
    manifest, zero rewrite), and the manifest records the split."""
    wh.save("p", _df(spark, range(0, 100)), stats_cols=["id"])
    wh.save("p", _df(spark, range(100, 200)), mode="append", stats_cols=["id"])
    wh.save("p", _df(spark, range(200, 300)), mode="append", stats_cols=["id"])
    before = wh._read_manifest("p", wh.latest_version("p"))
    src = spark.createDataFrame(
        [(250, "UPDATED"), (999, "NEW")], "id long, text string"
    )
    wh.merge_into("p", src, "id", stats_cols=["id"])
    after = wh._read_manifest("p", wh.latest_version("p"))
    # the two untouched ranges carried verbatim; only range [200,300) rewritten
    assert set(before["dirs"][:2]) <= set(after["dirs"])
    assert before["dirs"][2] not in after["dirs"]
    assert after["merge_touched"] == 1 and after["merge_untouched"] == 2
    got = {r["id"]: r["text"] for r in wh.load("p").collect()}
    assert len(got) == 301 and got[250] == "UPDATED" and got[999] == "NEW"
    assert got[0] == "doc 0" and got[150] == "doc 150"


def test_merge_into_honors_deletion_vectors(spark, wh):
    """Rows masked by deletion vectors must not count as matched; the
    vectors are carried for the untouched dirs."""
    from pyspark.sql import functions as F

    wh.save("d", _df(spark, [1, 2, 3]), stats_cols=["id"])
    wh.delete_where("d", F.col("id") == 2, key_col="id")
    src = spark.createDataFrame([(3, "UPDATED 3")], "id long, text string")
    wh.merge_into("d", src, "id")
    got = {r["id"]: r["text"] for r in wh.load("d").collect()}
    assert got == {1: "doc 1", 3: "UPDATED 3"}


def test_diff_change_feed_between_versions(spark, wh):
    """diff(v_from, v_to): inserts, deletes (pre-image), and changed rows
    (post-image) keyed by id — across a merge commit and transitively
    across several versions."""
    wh.save("cf", _df(spark, [1, 2, 3]), stats_cols=["id"])           # v0
    src = spark.createDataFrame(
        [(2, "doc 2 EDITED"), (9, "doc 9")], "id long, text string"
    )
    wh.merge_into("cf", src, "id", stats_cols=["id"])                 # v1
    changes = {
        (r["id"], r["_change"], r["text"]) for r in wh.diff("cf", 0, 1, "id").collect()
    }
    assert changes == {
        (9, "insert", "doc 9"),
        (2, "update_postimage", "doc 2 EDITED"),
    }
    # a delete shows its pre-image
    from pyspark.sql import functions as F

    wh.delete_where("cf", F.col("id") == 1, key_col="id")             # v2
    changes = {(r["id"], r["_change"]) for r in wh.diff("cf", 1, 2, "id").collect()}
    assert changes == {(1, "delete")}
    # transitive: v0 → v2 combines all of it
    changes = {(r["id"], r["_change"]) for r in wh.diff("cf", 0, 2, "id").collect()}
    assert changes == {(9, "insert"), (2, "update_postimage"), (1, "delete")}
    # no changes → empty feed
    assert wh.diff("cf", 2, 2, "id").collect() == []
