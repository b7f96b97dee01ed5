"""Incremental materialized aggregates (sinks/incremental_agg.py): fold
equals recompute under both write modes, exactly-once cursor semantics via
commit app-metadata, group death/revival, net-zero windows."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from es_household_retention_spark_job_spark.sinks.incremental_agg import (
    CURSOR_KEY,
    SOURCE_KEY,
    fold_aggregate,
    read_aggregate,
)
from es_household_retention_spark_job_spark.sinks.upsert import (
    ConcurrentWriteError,
    current_version,
    delete_keys,
    read_keyed_table,
    table_app_meta,
    upsert_parquet,
    write_keyed_table,
)


def _source(spark, path, n=60, groups=5):
    rows = [(f"k{i}", i % groups, (i + 1) * 10) for i in range(n)]
    write_keyed_table(
        spark.createDataFrame(rows, "k string, g int, v long"),
        path,
        key="k",
        n_buckets=8,
    )


def _recompute(spark, path):
    rows = (
        read_keyed_table(spark, path)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
        .collect()
    )
    return {r["g"]: (r["cnt"], r["sum_v"]) for r in rows}


def _agg_state(spark, agg_path):
    rows = read_aggregate(spark, agg_path).collect()
    return {r["g"]: (r["cnt"], r["sum_v"]) for r in rows}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_fold_matches_recompute_across_batches(spark, tmp_path, monkeypatch, mode):
    """Bootstrap + three folded mutation batches (updates, group moves,
    inserts, deletes) == a from-scratch recompute, under both source write
    modes — the fold never reads the source table, only its change feed."""
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    _source(spark, src)
    v = fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=4)
    assert v == current_version(src)
    assert _agg_state(spark, agg) == _recompute(spark, src)

    monkeypatch.setenv("SPARK_GRAFT_SINK_WRITE_MODE", mode)
    # batch 1: value updates + a group MOVE (k7: g 2 -> 4) + inserts
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame(
            [("k3", 3, 999), ("k7", 4, 70), ("new1", 0, 5), ("new2", 4, 6)],
            "k string, g int, v long",
        ),
        key="k",
        n_buckets=8,
    )
    fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=4)
    assert _agg_state(spark, agg) == _recompute(spark, src)

    # batch 2: deletes (including one key updated in batch 1)
    delete_keys(
        spark, src, spark.createDataFrame([("k3",), ("k10",)], "k string")
    )
    fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=4)
    assert _agg_state(spark, agg) == _recompute(spark, src)

    # batch 3: two source publishes folded in ONE fold call
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame([("k11", 1, 1)], "k string, g int, v long"),
        key="k",
        n_buckets=8,
    )
    delete_keys(spark, src, spark.createDataFrame([("new1",)], "k string"))
    fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=4)
    assert _agg_state(spark, agg) == _recompute(spark, src)


def test_fold_noop_at_unchanged_cursor(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    _source(spark, src, n=20)
    v = fold_aggregate(spark, src, agg, "g", ("v",))
    v_agg = current_version(agg)
    assert fold_aggregate(spark, src, agg, "g", ("v",)) == v
    assert current_version(agg) == v_agg  # no phantom publish


def test_stale_cursor_commit_rejected(spark, tmp_path):
    """The exactly-once guarantee: a commit conditioned on a cursor that
    has since advanced aborts instead of double-applying — even though its
    buckets may be disjoint from the racing fold's."""
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    _source(spark, src, n=20)
    fold_aggregate(spark, src, agg, "g", ("v",))
    with pytest.raises(ConcurrentWriteError, match="fold_source_version"):
        upsert_parquet(
            spark,
            agg,
            spark.createDataFrame([(0, 1, 1)], "g int, cnt long, sum_v long"),
            key="g",
            app_meta={CURSOR_KEY: 99},
            app_meta_expect={CURSOR_KEY: -1},  # computed from a stale state
        )
    # the aborted commit changed nothing
    assert table_app_meta(agg)[CURSOR_KEY] == current_version(src)


def test_group_death_keeps_zero_row_and_revives(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    _source(spark, src, n=10, groups=5)  # g=4: k4, k9
    fold_aggregate(spark, src, agg, "g", ("v",))
    delete_keys(spark, src, spark.createDataFrame([("k4",), ("k9",)], "k string"))
    fold_aggregate(spark, src, agg, "g", ("v",))
    assert 4 not in _agg_state(spark, agg)  # consumer view filters cnt=0
    raw = {
        r["g"]: (r["cnt"], r["sum_v"])
        for r in read_keyed_table(spark, agg).collect()
    }
    assert raw[4] == (0, 0)  # zero row retained, sums zeroed (not null)
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame([("k4", 4, 50)], "k string, g int, v long"),
        key="k",
        n_buckets=8,
    )
    fold_aggregate(spark, src, agg, "g", ("v",))
    assert _agg_state(spark, agg)[4] == (1, 50)


def test_net_zero_window_advances_cursor(spark, tmp_path):
    """A source publish whose resolved values are unchanged (same-value
    rewrite) yields an empty change set; the fold must still advance its
    cursor (empty-batch commit) or the feed window would grow forever."""
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    _source(spark, src, n=10)
    fold_aggregate(spark, src, agg, "g", ("v",))
    # rewrite k1 with its CURRENT value: version bumps, no resolved change
    cur = read_keyed_table(spark, src).where(F.col("k") == "k1")
    upsert_parquet(spark, src, cur, key="k", n_buckets=8)
    v = current_version(src)
    assert fold_aggregate(spark, src, agg, "g", ("v",)) == v
    assert table_app_meta(agg)[CURSOR_KEY] == v
    assert _agg_state(spark, agg) == _recompute(spark, src)


def test_app_meta_in_snapshot_and_source_guard(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    _source(spark, src, n=10)
    fold_aggregate(spark, src, agg, "g", ("v",))
    meta = table_app_meta(agg)
    assert meta[CURSOR_KEY] == current_version(src)
    assert meta[SOURCE_KEY] == os.path.abspath(src)
    # the version snapshot carries the app meta (auditable cursor history)
    snaps = [f for f in os.listdir(agg) if f.startswith("_manifest.v")]
    with open(os.path.join(agg, sorted(snaps)[-1])) as f:
        assert json.load(f)["app"][CURSOR_KEY] == meta[CURSOR_KEY]
    # folding a DIFFERENT source into the same aggregate is rejected
    other = str(tmp_path / "other")
    _source(spark, other, n=10)
    with pytest.raises(ValueError, match="folds"):
        fold_aggregate(spark, other, agg, "g", ("v",))


def test_null_group_rejected(spark, tmp_path):
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    write_keyed_table(
        spark.createDataFrame(
            [("a", 1, 10), ("b", None, 20)], "k string, g int, v long"
        ),
        src,
        key="k",
        n_buckets=4,
    )
    with pytest.raises(ValueError, match="null values in group column"):
        fold_aggregate(spark, src, agg, "g", ("v",))


def test_fold_large_group_set_full_scan_path(spark, tmp_path, monkeypatch):
    """Beyond FOLD_LOOKUP_MAX affected groups the fold joins against the
    full aggregate scan instead of collecting a driver-side key list —
    same result."""
    import es_household_retention_spark_job_spark.sinks.incremental_agg as ia

    monkeypatch.setattr(ia, "FOLD_LOOKUP_MAX", 2)
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    _source(spark, src, n=40, groups=8)  # 8 affected groups > cap of 2
    fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=4)
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame(
            [(f"k{i}", i % 8, 1000 + i) for i in range(8)],
            "k string, g int, v long",
        ),
        key="k",
        n_buckets=8,
    )
    fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=4)
    assert _agg_state(spark, agg) == _recompute(spark, src)


def test_fold_composite_group(spark, tmp_path, monkeypatch):
    """Multi-column groups: the aggregate keys on a synthesized composite
    column (group values stay as data columns; read_aggregate hides the
    key); folds across mutations match a from-scratch recompute."""
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    rows = [(f"k{i}", i % 3, f"s{i % 2}", (i + 1) * 10) for i in range(30)]
    write_keyed_table(
        spark.createDataFrame(rows, "k string, g int, s string, v long"),
        src,
        key="k",
        n_buckets=8,
    )

    def recompute():
        out = (
            read_keyed_table(spark, src)
            .groupBy("g", "s")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
            .collect()
        )
        return {(r["g"], r["s"]): (r["cnt"], r["sum_v"]) for r in out}

    fold_aggregate(spark, src, agg, ["g", "s"], ("v",), n_buckets=4)
    got = read_aggregate(spark, agg)
    assert sorted(got.columns) == ["cnt", "g", "s", "sum_v"]  # key hidden
    state = {(r["g"], r["s"]): (r["cnt"], r["sum_v"]) for r in got.collect()}
    assert state == recompute()

    monkeypatch.setenv("SPARK_GRAFT_SINK_WRITE_MODE", "mor")
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame(
            [("k1", 2, "s1", 999), ("new1", 0, "s0", 7)],
            "k string, g int, s string, v long",
        ),
        key="k",
        n_buckets=8,
    )
    delete_keys(spark, src, spark.createDataFrame([("k2",)], "k string"))
    fold_aggregate(spark, src, agg, ["g", "s"], ("v",), n_buckets=4)
    state = {
        (r["g"], r["s"]): (r["cnt"], r["sum_v"])
        for r in read_aggregate(spark, agg).collect()
    }
    assert state == recompute()

def test_composite_group_separator_collision(spark, tmp_path):
    """ADVICE r9 (incremental_agg.py:76): group values containing the
    composite-key separator (or the escape character) must NOT collide —
    ('a\\x1fb', 'c') and ('a', 'b\\x1fc') are distinct groups."""
    from es_household_retention_spark_job_spark.sinks.incremental_agg import (
        fold_aggregate,
        read_aggregate,
    )
    from es_household_retention_spark_job_spark.sinks.upsert import (
        write_keyed_table,
    )

    src = str(tmp_path / "sep_src")
    agg = str(tmp_path / "sep_agg")
    rows = [
        (1, "a\x1fb", "c", 10),
        (2, "a", "b\x1fc", 20),
        (3, "a\\", "\x1fc", 30),   # escape char in value
        (4, "a\\\x1f", "c", 40),   # escape + separator
        (5, "a", "b\x1fc", 5),     # genuine duplicate of group 2
    ]
    write_keyed_table(
        spark.createDataFrame(rows, "id long, g1 string, g2 string, v long"),
        src,
        key="id",
        n_buckets=2,
    )
    fold_aggregate(spark, src, agg, ["g1", "g2"], ("v",), n_buckets=2)
    got = {
        (r["g1"], r["g2"]): (r["cnt"], r["sum_v"])
        for r in read_aggregate(spark, agg).collect()
    }
    assert got == {
        ("a\x1fb", "c"): (1, 10),
        ("a", "b\x1fc"): (2, 25),
        ("a\\", "\x1fc"): (1, 30),
        ("a\\\x1f", "c"): (1, 40),
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_fold_minmax_distinct_matches_recompute(spark, tmp_path, monkeypatch, mode):
    """Round 10 fold families: min/max (apply folds via least/greatest; a
    retraction hitting the stored extremum triggers the suspect-group
    source recompute) and HLL distinct (apply folds via sketch union;
    ANY retraction triggers the recompute) equal a from-scratch recompute
    after every batch, under both write modes. The mutation script
    deliberately deletes group minima/maxima and re-inserts values."""
    monkeypatch.setenv("SPARK_GRAFT_SINK_WRITE_MODE", mode)
    src = str(tmp_path / f"mmd_src_{mode}")
    agg = str(tmp_path / f"mmd_agg_{mode}")
    _source(spark, src, n=60, groups=5)
    kw = dict(
        sum_cols=("v",),
        min_cols=("v",),
        max_cols=("v",),
        distinct_cols=("v",),
        n_buckets=4,
    )
    fold_aggregate(spark, src, agg, "g", **kw)

    def truth():
        rows = (
            read_keyed_table(spark, src)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("v").alias("sum_v"),
                F.min("v").alias("min_v"),
                F.max("v").alias("max_v"),
                F.countDistinct("v").alias("dcnt_v"),
            )
            .collect()
        )
        return {
            r["g"]: (r["cnt"], r["sum_v"], r["min_v"], r["max_v"], r["dcnt_v"])
            for r in rows
        }

    def folded():
        rows = read_aggregate(spark, agg).collect()
        return {
            r["g"]: (r["cnt"], r["sum_v"], r["min_v"], r["max_v"], r["dcnt_v"])
            for r in rows
        }

    assert folded() == truth()  # bootstrap

    # batch 1: delete the global min (k0: g0 v=10) and the global max
    # (k59: g4 v=600) -> both groups' extrema retract -> suspect recompute
    delete_keys(
        spark, src, spark.createDataFrame([("k0",), ("k59",)], "k string")
    )
    fold_aggregate(spark, src, agg, "g", **kw)
    assert folded() == truth()

    # batch 2: update a non-extremum to a NEW global min (apply-side fold,
    # no suspicion), insert a duplicate value (distinct unchanged but HLL
    # union applied), and a value update that shifts a max upward
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame(
            [("k7", 2, -999), ("k100", 0, 20), ("k58", 3, 99999)],
            "k string, g int, v long",
        ),
        key="k",
        n_buckets=8,
    )
    fold_aggregate(spark, src, agg, "g", **kw)
    assert folded() == truth()

    # batch 3: kill an entire group (all g==1 keys) -> cnt=0 row with
    # nulled extrema (hidden by read_aggregate), then revive it
    g1 = read_keyed_table(spark, src).where(F.col("g") == 1).select("k")
    delete_keys(spark, src, g1)
    fold_aggregate(spark, src, agg, "g", **kw)
    assert folded() == truth()
    assert 1 not in folded()
    dead = {
        r["g"]: (r["min_v"], r["max_v"])
        for r in read_keyed_table(spark, agg).where(F.col("cnt") == 0).collect()
    }
    assert dead == {1: (None, None)}
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame([("kz", 1, 777)], "k string, g int, v long"),
        key="k",
        n_buckets=8,
    )
    fold_aggregate(spark, src, agg, "g", **kw)
    assert folded() == truth()
    assert folded()[1] == (1, 777, 777, 777, 1)


def _pctl_truth(spark, src, lo, hi, n, q_num, q_den):
    """Sequential python replay of the histogram-percentile definition
    over the source table's resolved state — the dict-model ground truth
    the folded arrays must reproduce exactly."""
    width = (hi - lo) // n
    by_g: dict = {}
    for r in read_keyed_table(spark, src).collect():
        by_g.setdefault(r["g"], []).append(r["v"])
    out = {}
    for g, vals in by_g.items():
        vals = [v for v in vals if v is not None]
        buckets = [0] * (n + 2)
        for v in vals:
            if v < lo:
                b = 0
            elif v >= hi:
                b = n + 1
            else:
                b = (v - lo) * n // (hi - lo) + 1
            buckets[b] += 1
        total = len(vals)
        rank = -(-total * q_num // q_den)  # ceil
        cum, idx = 0, -1
        for i, c in enumerate(buckets):
            cum += c
            if cum >= rank:
                idx = i
                break
        if total == 0 or idx <= 0:
            out[g] = None
        elif idx >= n + 1:
            out[g] = hi
        else:
            out[g] = lo + (idx - 1) * width
    return out


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_fold_histogram_percentile_matches_replay(spark, tmp_path, monkeypatch, mode):
    """Round 11 family: the fixed-bucket histogram fold is FULLY
    retractable — deletes (including of stored extrema, which would mark
    min/max suspect) just decrement their bucket, and every batch's
    percentile read-out equals a sequential python replay of the
    definition. Under/overflow slots and group death/revival included."""
    from es_household_retention_spark_job_spark.sinks.incremental_agg import (
        read_percentiles,
    )

    monkeypatch.setenv("SPARK_GRAFT_SINK_WRITE_MODE", mode)
    src = str(tmp_path / f"hist_src_{mode}")
    agg = str(tmp_path / f"hist_agg_{mode}")
    _source(spark, src, n=60, groups=5)  # v = 10..600
    spec = (0, 600, 60)  # width 10; v=600 rows land in overflow
    kw = dict(n_buckets=4, hist_cols={"v": spec})
    fold_aggregate(spark, src, agg, "g", **kw)

    def folded():
        rows = read_percentiles(
            spark, agg, {"v": [(1, 2), (9, 10)]}
        ).collect()
        return (
            {r["g"]: r["p50_v"] for r in rows},
            {r["g"]: r["p90_v"] for r in rows},
        )

    def truth():
        return (
            _pctl_truth(spark, src, *spec, 1, 2),
            _pctl_truth(spark, src, *spec, 9, 10),
        )

    assert folded() == truth()  # bootstrap

    # batch 1: delete group extrema (the retraction min/max would recompute
    # for — the histogram must NOT need that) + out-of-range inserts that
    # exercise the underflow and overflow slots
    delete_keys(
        spark, src, spark.createDataFrame([("k0",), ("k59",)], "k string")
    )
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame(
            [("neg", 2, -50), ("big", 2, 5000), ("k3", 3, 599)],
            "k string, g int, v long",
        ),
        key="k",
        n_buckets=8,
    )
    fold_aggregate(spark, src, agg, "g", **kw)
    assert folded() == truth()

    # batch 2: kill a whole group (null histogram on the zero row), revive
    g1 = read_keyed_table(spark, src).where(F.col("g") == 1).select("k")
    delete_keys(spark, src, g1)
    fold_aggregate(spark, src, agg, "g", **kw)
    assert folded() == truth()
    dead = (
        read_keyed_table(spark, agg).where(F.col("cnt") == 0).collect()
    )
    assert [r["_hist_v"] for r in dead] == [None]
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame([("kz", 1, 305)], "k string, g int, v long"),
        key="k",
        n_buckets=8,
    )
    fold_aggregate(spark, src, agg, "g", **kw)
    assert folded() == truth()
    assert folded()[0][1] == 300  # single value 305 -> bucket [300, 310)


def test_histogram_spec_recorded_and_enforced(spark, tmp_path):
    """The bucket spec rides the bootstrap commit; a later fold with a
    different (or missing) spec must refuse rather than mix bucketings,
    and an invalid spec is rejected up front."""
    from es_household_retention_spark_job_spark.sinks.incremental_agg import (
        hist_specs,
    )

    src = str(tmp_path / "spec_src")
    agg = str(tmp_path / "spec_agg")
    _source(spark, src)
    fold_aggregate(spark, src, agg, "g", n_buckets=4, hist_cols={"v": (0, 600, 60)})
    assert hist_specs(agg) == {"v": (0, 600, 60)}
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame([("k0", 0, 11)], "k string, g int, v long"),
        key="k",
        n_buckets=8,
    )
    with pytest.raises(ValueError, match="spec mismatch"):
        fold_aggregate(
            spark, src, agg, "g", n_buckets=4, hist_cols={"v": (0, 600, 30)}
        )
    with pytest.raises(ValueError, match="spec mismatch"):
        fold_aggregate(spark, src, agg, "g", n_buckets=4)
    with pytest.raises(ValueError, match="divisible"):
        fold_aggregate(
            spark, src, agg, "g", n_buckets=4, hist_cols={"v": (0, 601, 60)}
        )
    # the matching spec still folds
    fold_aggregate(
        spark, src, agg, "g", n_buckets=4, hist_cols={"v": (0, 600, 60)}
    )


def test_read_topk_matches_recompute_across_moves(spark, tmp_path, monkeypatch):
    """Exact top-k frequent items from the composite (group, item) count
    fold: updates that MOVE an item (retract one bucket, apply another),
    deletes, and inserts all fold; the ranked read equals a from-scratch
    recompute with the same deterministic tie-break."""
    from es_household_retention_spark_job_spark.sinks.incremental_agg import (
        read_topk,
    )

    monkeypatch.setenv("SPARK_GRAFT_SINK_WRITE_MODE", "mor")
    src = str(tmp_path / "topk_src")
    agg = str(tmp_path / "topk_agg")
    rows = [(f"k{i}", i % 3, (i * i) % 7) for i in range(60)]
    write_keyed_table(
        spark.createDataFrame(rows, "k string, g int, item long"),
        src,
        key="k",
        n_buckets=8,
    )
    fold_aggregate(spark, src, agg, ["g", "item"], n_buckets=4)

    def truth():
        df = read_keyed_table(spark, src).groupBy("g", "item").count()
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["g"], []).append((r["item"], r["count"]))
        return {
            g: [
                item
                for item, _ in sorted(v, key=lambda t: (-t[1], t[0]))[:2]
            ]
            for g, v in out.items()
        }

    def folded():
        out: dict = {}
        for r in read_topk(spark, agg, ["g"], "item", k=2).collect():
            out.setdefault(r["g"], []).append((r["rank"], r["item"]))
        return {g: [i for _, i in sorted(v)] for g, v in out.items()}

    assert folded() == truth()
    # moves + deletes + inserts
    upsert_parquet(
        spark,
        src,
        spark.createDataFrame(
            [("k1", 1, 6), ("k4", 1, 6), ("k7", 1, 6), ("n1", 2, 0)],
            "k string, g int, item long",
        ),
        key="k",
        n_buckets=8,
    )
    delete_keys(
        spark, src, spark.createDataFrame([("k9",), ("k12",)], "k string")
    )
    fold_aggregate(spark, src, agg, ["g", "item"], n_buckets=4)
    assert folded() == truth()
