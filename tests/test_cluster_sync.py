"""Incrementally-maintained duplicate clusters (round 12b): the
union-find table follows the documents table at O(changes) through the
CDC loop, reads equal a batch recompute for insert-only streams (and
for mutations that don't sever a pair-bridge), merges re-point ONE row,
deletes are membership-only with the conservative-merge trade pinned
loudly, compress purges ghosts. Round 13: the pair-bridge coarsening
applies to UPDATES exactly like deletes (union-find cannot unmerge) —
pinned below with rebuild-as-reconcile."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_household_retention_spark_job_spark.operators import clusters as C
from es_household_retention_spark_job_spark.operators import dedup as D
from es_household_retention_spark_job_spark.sinks import upsert as U
from es_household_retention_spark_job_spark.sources.tpch import load_table
from es_household_retention_spark_job_spark.streaming.index_sync import (
    cdc_stream_id,
    sync_dedup_clusters,
    sync_neardup_index,
)

from .conftest import SF_DIR

_BASE = " ".join(f"w{i}" for i in range(20))
_TA = _BASE + " " + " ".join(f"x{i}" for i in range(8))
_TB = _BASE + " " + " ".join(f"y{i}" for i in range(8))


def _batch(spark, docs):
    return sorted(
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in D.duplicate_clusters(D.minhash_lsh_pairs(docs)).collect()
    )


def _view(spark, path):
    return sorted(
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in C.read_dedup_clusters(spark, path).collect()
    )


def test_cluster_bootstrap_equals_batch(spark, tmp_path):
    """build_cluster_table + read_dedup_clusters over a real corpus
    reproduce the batch operator exactly (the bootstrap is the batch
    operator, stored path-compressed)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "clusters")
    C.build_cluster_table(docs, path)
    assert _view(spark, path) == _batch(spark, docs)
    assert _view(spark, path)  # non-trivial on this corpus


def test_cluster_sync_follows_table(spark, tmp_path):
    """Insert and update windows flow through sync_neardup_index →
    sync_dedup_clusters; after every window the served view equals a
    batch recompute over the table's resolved state. The cursor is
    exactly-once (replay no-ops; a forged stale commit aborts)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    table = str(tmp_path / "table")
    idx = str(tmp_path / "idx")
    cl = str(tmp_path / "clusters")
    U.write_keyed_table(docs, table, key="doc_id", n_buckets=4)
    v0 = U.current_version(table)
    stream = cdc_stream_id(table)
    D.build_neardup_index(U.read_keyed_table(spark, table), idx)
    C.build_cluster_table(
        U.read_keyed_table(spark, table), cl, epoch=v0, epoch_stream=stream
    )

    # window 1: fresh near-dups of existing docs (insert-only)
    fresh = docs.where(F.col("doc_id") % 19 == 7).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    U.upsert_parquet(spark, table, fresh, key="doc_id")
    sync_neardup_index(spark, idx, table, from_version=v0)
    out = sync_dedup_clusters(spark, cl, table, idx)
    assert out["upserted"] > 0
    assert _view(spark, cl) == _batch(
        spark, U.read_keyed_table(spark, table)
    )

    # window 2: a doc UPDATES into near-dup of another (text change)
    donor = docs.where(F.col("doc_id") % 19 == 7).limit(1).collect()[0]
    target_id = 500_777  # fresh id: was never clustered before
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame(
            [(target_id, donor["text"])], "doc_id long, text string"
        ),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table)
    out2 = sync_dedup_clusters(spark, cl, table, idx)
    assert out2["upserted"] == 1
    assert _view(spark, cl) == _batch(
        spark, U.read_keyed_table(spark, table)
    )

    # replay: clean no-op, nothing double-applied
    out3 = sync_dedup_clusters(spark, cl, table, idx)
    assert out3["from"] == out3["to"]
    # forged replay from a stale cursor must abort loudly
    ups = U.read_keyed_table(spark, table).where(
        F.col("doc_id") == target_id
    )
    with pytest.raises(U.ConcurrentWriteError, match="app meta"):
        C.apply_cluster_window(
            spark, cl, ups, [target_id], [], idx, "text", "doc_id",
            epoch=out2["to"], epoch_stream=stream,
            expect_epoch=out2["from"],
        )
    # an unsynced index refuses to guess the window
    with pytest.raises(ValueError, match="sync_neardup_index first"):
        sync_dedup_clusters(spark, cl, table, str(tmp_path / "noidx"))


def _synthetic_two_clusters(spark, tmp_path):
    """table + index + cluster table over {10,11}=TA, {20,21}=TB (two
    disjoint near-dup cliques; the _BASE bridge doc joins both)."""
    docs = spark.createDataFrame(
        [(10, _TA), (11, _TA), (20, _TB), (21, _TB)],
        "doc_id long, text string",
    )
    table = str(tmp_path / "table")
    idx = str(tmp_path / "idx")
    cl = str(tmp_path / "clusters")
    U.write_keyed_table(docs, table, key="doc_id", n_buckets=4)
    v0 = U.current_version(table)
    stream = cdc_stream_id(table)
    D.build_neardup_index(U.read_keyed_table(spark, table), idx)
    C.build_cluster_table(
        U.read_keyed_table(spark, table), cl, epoch=v0, epoch_stream=stream
    )
    return docs, table, idx, cl, v0


def test_cluster_merge_repoints_one_row(spark, tmp_path):
    """A bridge doc merging two existing clusters re-points exactly ONE
    stored row (the losing root) — never the members — and the served
    view equals the batch recompute."""
    docs, table, idx, cl, v0 = _synthetic_two_clusters(spark, tmp_path)
    assert _view(spark, cl) == [
        (10, 10, 2), (11, 10, 2), (20, 20, 2), (21, 20, 2),
    ]
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame([(5, _BASE)], "doc_id long, text string"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table, from_version=v0)
    out = sync_dedup_clusters(spark, cl, table, idx)
    assert out["upserted"] == 1 and out["merged_roots"] == 2
    assert _view(spark, cl) == _batch(
        spark, U.read_keyed_table(spark, table)
    )
    # members 11 and 21 still hold their ORIGINAL pointers (10 and 20) —
    # the merge wrote the roots' rows, not the memberships
    rows = {
        r["doc_id"]: r["parent"]
        for r in U.read_keyed_table(spark, cl).collect()
    }
    assert rows[11] == 10 and rows[21] == 20
    assert rows[10] == 5 and rows[20] == 5  # the two re-pointed roots


def test_cluster_delete_membership_and_conservative_merge(
    spark, tmp_path
):
    """Deletes are membership-only: the doc leaves the view, a cluster
    shrunk below two live members disappears, and — the documented
    conservative trade — deleting the BRIDGE does not split the merged
    component (a rebuild reconciles; pinned divergence, not a bug)."""
    docs, table, idx, cl, v0 = _synthetic_two_clusters(spark, tmp_path)
    # merge through the bridge first
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame([(5, _BASE)], "doc_id long, text string"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table, from_version=v0)
    sync_dedup_clusters(spark, cl, table, idx)
    # delete a clique member: view drops it, batch equality HOLDS (the
    # remaining component is still connected without it)
    U.delete_keys(
        spark, table, spark.createDataFrame([(11,)], "doc_id long"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table)
    out = sync_dedup_clusters(spark, cl, table, idx)
    assert out["deleted"] == 1
    assert _view(spark, cl) == _batch(
        spark, U.read_keyed_table(spark, table)
    )
    # delete the BRIDGE: batch SPLITS {10},{20,21}; union-find keeps the
    # merged component — the conservative divergence, pinned here
    U.delete_keys(
        spark, table, spark.createDataFrame([(5,)], "doc_id long"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table)
    sync_dedup_clusters(spark, cl, table, idx)
    got = _view(spark, cl)
    want_batch = _batch(spark, U.read_keyed_table(spark, table))
    assert want_batch == [(20, 20, 2), (21, 20, 2)]  # 10 is a singleton
    assert got == [(10, 10, 3), (20, 10, 3), (21, 10, 3)]  # conservative
    # a rebuild reconciles exactly
    C.build_cluster_table(U.read_keyed_table(spark, table), cl)
    assert _view(spark, cl) == want_batch


def test_cluster_compress_purges_ghosts_and_shortens_chains(
    spark, tmp_path
):
    """compress_dedup_clusters: every live row points directly at its
    (live-re-rooted) root afterwards, ghost rows are gone, the served
    view is unchanged, and a second compress is a no-op."""
    docs, table, idx, cl, v0 = _synthetic_two_clusters(spark, tmp_path)
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame([(5, _BASE)], "doc_id long, text string"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table, from_version=v0)
    sync_dedup_clusters(spark, cl, table, idx)
    U.delete_keys(
        spark, table, spark.createDataFrame([(5,)], "doc_id long"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table)
    sync_dedup_clusters(spark, cl, table, idx)
    before = _view(spark, cl)
    res = C.compress_dedup_clusters(spark, cl)
    assert res["purged"] == 1  # the deleted bridge's ghost row
    after_rows = {
        r["doc_id"]: (r["parent"], r["live"])
        for r in U.read_keyed_table(spark, cl).collect()
    }
    assert 5 not in after_rows
    # fully compressed: every row's parent IS the live re-rooted root
    assert after_rows == {
        10: (10, True), 11: (10, True), 20: (10, True), 21: (10, True),
    }
    assert _view(spark, cl) == before
    res2 = C.compress_dedup_clusters(spark, cl)
    assert res2 == {"repointed": 0, "purged": 0}


def test_cluster_update_departure_semantics(spark, tmp_path):
    """An updated doc whose new text LEAVES its cluster detaches exactly
    when it is not a routing node (rows are path-compressed, so members
    never route through other members) — batch equality holds. A
    CURRENT ROOT's departure is the documented conservative case: its
    membership lingers until a rebuild reconciles."""
    docs, table, idx, cl, v0 = _synthetic_two_clusters(spark, tmp_path)
    # non-root member 11 departs: exact
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame(
            [(11, "totally unrelated noise " + " ".join(
                f"z{i}" for i in range(30)
            ))],
            "doc_id long, text string",
        ),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table, from_version=v0)
    out = sync_dedup_clusters(spark, cl, table, idx)
    assert out["upserted"] == 1
    want = _batch(spark, U.read_keyed_table(spark, table))
    assert want == [(20, 20, 2), (21, 20, 2)]  # A is gone entirely
    assert _view(spark, cl) == want
    # root 20 departs: conservative (view keeps it) — pinned divergence
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame(
            [(20, "other unrelated noise " + " ".join(
                f"q{i}" for i in range(30)
            ))],
            "doc_id long, text string",
        ),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table)
    sync_dedup_clusters(spark, cl, table, idx)
    assert _batch(spark, U.read_keyed_table(spark, table)) == []
    assert _view(spark, cl) == [(20, 20, 2), (21, 20, 2)]  # conservative
    # the rebuild reconciles exactly
    C.build_cluster_table(U.read_keyed_table(spark, table), cl)
    assert _view(spark, cl) == []


def test_cluster_former_root_departure_after_compress(spark, tmp_path):
    """After a merge, the LOSING root is a routing node (sticky flag —
    its departure stays conservative); compression clears the flag, and
    the SAME departure then detaches exactly. The flag's lifecycle is
    what keeps chains safe without a reverse index."""
    docs, table, idx, cl, v0 = _synthetic_two_clusters(spark, tmp_path)
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame([(5, _BASE)], "doc_id long, text string"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table, from_version=v0)
    sync_dedup_clusters(spark, cl, table, idx)  # 5 roots, 10/20 flagged
    rows = {
        r["doc_id"]: (r["parent"], r["routed"])
        for r in U.read_keyed_table(spark, cl).collect()
    }
    assert rows[10] == (5, True) and rows[20] == (5, True)
    # compress: 21 re-points directly at 5, 20 unflagged
    C.compress_dedup_clusters(spark, cl)
    rows = {
        r["doc_id"]: (r["parent"], r["routed"])
        for r in U.read_keyed_table(spark, cl).collect()
    }
    assert rows == {
        5: (5, True), 10: (5, False), 11: (5, False),
        20: (5, False), 21: (5, False),
    }
    # former root 20 departs: now EXACT (nothing routes through it)
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame(
            [(20, "unique departure " + " ".join(
                f"k{i}" for i in range(30)
            ))],
            "doc_id long, text string",
        ),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table)
    sync_dedup_clusters(spark, cl, table, idx)
    assert _view(spark, cl) == _batch(
        spark, U.read_keyed_table(spark, table)
    )


def test_cluster_update_severed_pair_bridge_coarsens(spark, tmp_path):
    """ADVICE r12 (medium): an updated NON-ROUTING doc detaches exactly,
    but the unions its old pairs justified stay — if the doc was the
    only transitive link between its ex-neighbors (X~A, A~Y, X≁Y), they
    remain merged after A's update, exactly like a bridge DELETE. The
    served view is coarser-not-wrong (batch clusters contained in one
    served cluster), and rebuild reconciles exactly."""
    docs, table, idx, cl, v0 = _synthetic_two_clusters(spark, tmp_path)
    # bridge doc 15 (NOT the component minimum → non-root, unrouted):
    # pairs with both cliques, merging {10,11,15,20,21} at root 10
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame([(15, _BASE)], "doc_id long, text string"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table, from_version=v0)
    sync_dedup_clusters(spark, cl, table, idx)
    assert _view(spark, cl) == _batch(
        spark, U.read_keyed_table(spark, table)
    )
    rows = {
        r["doc_id"]: (r["parent"], r["routed"])
        for r in U.read_keyed_table(spark, cl).collect()
    }
    assert rows[15] == (10, False)  # detachable: member, never a root
    # 15 UPDATES away: it detaches exactly (leaves the view), but its
    # severed pair-bridge leaves {10,11} and {20,21} merged — the
    # documented coarsening, now pinned for updates
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame(
            [(15, "severed bridge noise " + " ".join(
                f"v{i}" for i in range(30)
            ))],
            "doc_id long, text string",
        ),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table)
    sync_dedup_clusters(spark, cl, table, idx)
    want_batch = _batch(spark, U.read_keyed_table(spark, table))
    assert want_batch == [
        (10, 10, 2), (11, 10, 2), (20, 20, 2), (21, 20, 2),
    ]
    got = _view(spark, cl)
    assert got == [
        (10, 10, 4), (11, 10, 4), (20, 10, 4), (21, 10, 4),
    ]  # coarser: one served cluster contains both batch clusters
    # (15 itself is GONE from the view — the detach was exact)
    # rebuild-as-reconcile splits exactly
    C.build_cluster_table(U.read_keyed_table(spark, table), cl)
    assert _view(spark, cl) == want_batch


def test_cluster_pairless_singleton_writes_no_row(spark, tmp_path):
    """ADVICE r12: a previously-absent doc upserted with NO near-dup
    pairs writes NO union-find row — under a churny stream the table
    stays O(clustered docs), not O(ever-touched docs). A later window
    that pairs the doc writes its rows then."""
    docs, table, idx, cl, v0 = _synthetic_two_clusters(spark, tmp_path)
    n_rows0 = U.read_keyed_table(spark, cl).count()
    uniq = "lonely document " + " ".join(f"u{i}" for i in range(30))
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame([(99, uniq)], "doc_id long, text string"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table, from_version=v0)
    out = sync_dedup_clusters(spark, cl, table, idx)
    # the window applied ZERO rows (actually-applied semantics) but the
    # cursor advanced in the same cursor-only commit
    assert out["upserted"] == 0 and out["to"] > out["from"]
    assert U.read_keyed_table(spark, cl).count() == n_rows0  # rowless
    assert _view(spark, cl) == _batch(
        spark, U.read_keyed_table(spark, table)
    )
    # the cursor still advanced (replay is a no-op)
    again = sync_dedup_clusters(spark, cl, table, idx)
    assert again["from"] == again["to"]
    # a later window pairing the doc materializes its membership
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame([(98, uniq)], "doc_id long, text string"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table)
    sync_dedup_clusters(spark, cl, table, idx)
    view = _view(spark, cl)
    assert (98, 98, 2) in view and (99, 98, 2) in view
    assert view == _batch(spark, U.read_keyed_table(spark, table))


def test_cluster_random_sequence_invariants(spark, tmp_path):
    """Seeded random windows (near-dup inserts, text updates — some into
    clusters, some away, some onto ROUTING nodes — deletes, occasional
    compression) drive the maintained table while a dict models the
    resolved corpus. After every window the served view must satisfy the
    operator's contract against a fresh BATCH recompute:

    - soundness: every served member is live in the corpus;
    - completeness: every batch-clustered doc is served;
    - coarsening: each batch cluster lands INSIDE one served cluster
      (conservative events may merge, never split);
    - exactness: while no conservative event has occurred (no deletes,
      no routing-node departures), the view EQUALS the batch — and a
      final rebuild restores exactness unconditionally."""
    import random

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 200)
    )
    model = {r.doc_id: r.text for r in docs.collect()}
    table = str(tmp_path / "table")
    idx = str(tmp_path / "idx")
    cl = str(tmp_path / "clusters")
    schema = "doc_id long, text string"

    def frame(d):
        return spark.createDataFrame(sorted(d.items()), schema)

    U.write_keyed_table(frame(model), table, key="doc_id", n_buckets=4)
    v0 = U.current_version(table)
    D.build_neardup_index(U.read_keyed_table(spark, table), idx)
    C.build_cluster_table(
        U.read_keyed_table(spark, table), cl,
        epoch=v0, epoch_stream=cdc_stream_id(table),
    )
    rng = random.Random(1206)
    next_id = 10_000
    conservative = False

    def routing_ids():
        return {
            r["doc_id"]
            for r in U.read_keyed_table(spark, cl)
            .where(F.col("routed") | (F.col("parent") == F.col("doc_id")))
            .select("doc_id")
            .collect()
        }

    for step in range(12):
        op = rng.choice(["insert", "insert", "update", "update", "delete"])
        if op == "insert":  # near-dup copies of existing docs
            ups = {}
            for _ in range(rng.randint(1, 4)):
                nonlocal_id = next_id
                next_id += 1
                ups[nonlocal_id] = model[rng.choice(sorted(model))]
            model.update(ups)
            U.upsert_parquet(spark, table, frame(ups), key="doc_id")
        elif op == "update":
            routing = routing_ids()
            tid = rng.choice(sorted(model))
            if rng.random() < 0.5:  # depart: unique noise text
                new_text = f"departed {tid} " + " ".join(
                    f"n{tid}x{i}" for i in range(25)
                )
            else:  # join: copy another doc's text
                new_text = model[rng.choice(sorted(model))]
            if tid in routing:
                conservative = True
            model[tid] = new_text
            U.upsert_parquet(
                spark, table, frame({tid: new_text}), key="doc_id"
            )
        else:
            tid = rng.choice(sorted(model))
            del model[tid]
            conservative = True
            U.delete_keys(
                spark, table,
                spark.createDataFrame([(tid,)], "doc_id long"),
                key="doc_id",
            )
        sync_neardup_index(spark, idx, table, from_version=v0)
        sync_dedup_clusters(spark, cl, table, idx, from_version=v0)
        if rng.random() < 0.25:
            C.compress_dedup_clusters(spark, cl)

        served = {
            r.doc_id: r.cluster_id
            for r in C.read_dedup_clusters(spark, cl).collect()
        }
        want = _batch(spark, frame(model))
        batch_map = {d: c for d, c, _ in want}
        # soundness + completeness
        assert set(served) <= set(model), step
        assert set(batch_map) <= set(served), step
        # coarsening: a batch cluster never splits across served clusters
        by_batch: dict = {}
        for d, c in batch_map.items():
            by_batch.setdefault(c, set()).add(served[d])
        assert all(len(s) == 1 for s in by_batch.values()), (step, by_batch)
        if not conservative:
            assert _view(spark, cl) == want, step
    # the rebuild reconciles unconditionally
    C.build_cluster_table(U.read_keyed_table(spark, table), cl)
    assert _view(spark, cl) == _batch(spark, frame(model))


def test_cluster_compress_aborts_on_raced_sync(spark, tmp_path, monkeypatch):
    """compress_dedup_clusters is OPTIMISTIC (review finding): a sync
    that commits between the compression's plan and its commit bumps the
    CDC cursor, so the stale compression aborts with
    ConcurrentWriteError instead of silently overwriting the racer's
    merge or purging a just-resurrected row."""
    docs, table, idx, cl, v0 = _synthetic_two_clusters(spark, tmp_path)
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame([(5, _BASE)], "doc_id long, text string"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table, from_version=v0)
    sync_dedup_clusters(spark, cl, table, idx)  # repoints exist now
    orig = C._resolved

    def raced(rows, **kw):
        out = orig(rows, **kw)
        # the racer: a sync commit advances the cursor mid-compression
        U.commit_app_meta(cl, {C.CLUSTER_EPOCH_KEY: 999_999})
        return out

    monkeypatch.setattr(C, "_resolved", raced)
    with pytest.raises(U.ConcurrentWriteError, match="app meta"):
        C.compress_dedup_clusters(spark, cl)
    monkeypatch.setattr(C, "_resolved", orig)
    # the raced state is intact: the view still serves the merge
    assert {r.cluster_id for r in C.read_dedup_clusters(spark, cl).collect()} == {5}


def test_cluster_ghost_root_merge_stays_dead(spark, tmp_path):
    """Review-of-review finding pinned: when a window merges into a
    component whose ROOT is a ghost (deleted doc) that is not itself in
    the window's touched set, the losing root's re-pointed row must keep
    live=false — defaulting it resurrected the deleted doc's membership
    in the served view (a soundness violation)."""
    docs, table, idx, cl, v0 = _synthetic_two_clusters(spark, tmp_path)
    U.delete_keys(
        spark, table, spark.createDataFrame([(10,)], "doc_id long"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table, from_version=v0)
    sync_dedup_clusters(spark, cl, table, idx)
    # {10,11} lost its root: 11 alone -> not served; {20,21} unaffected
    assert _view(spark, cl) == [(20, 20, 2), (21, 20, 2)]
    # the bridge doc pairs with 11 (and 20/21): the union routes through
    # the GHOST root 10, whose row is re-pointed but must stay dead
    U.upsert_parquet(
        spark,
        table,
        spark.createDataFrame([(5, _BASE)], "doc_id long, text string"),
        key="doc_id",
    )
    sync_neardup_index(spark, idx, table)
    sync_dedup_clusters(spark, cl, table, idx)
    served = _view(spark, cl)
    assert 10 not in {d for d, _, _ in served}  # deleted doc stays dead
    assert served == _batch(spark, U.read_keyed_table(spark, table))
    rows = {
        r["doc_id"]: (r["parent"], r["live"])
        for r in U.read_keyed_table(spark, cl).collect()
    }
    assert rows[10] == (5, False)  # re-pointed ghost, still a ghost
