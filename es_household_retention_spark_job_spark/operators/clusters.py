"""Incrementally-maintained duplicate clusters: the ``dedup_clusters``
view as a SERVED structure that follows the documents table at
O(changes), completing the CDC maintenance family (text index, ANN
index, near-dup band index → now the cluster view those pairs feed).

Reference parity note: the reference job (HouseholdRetentionProcessing,
src/main/scala/HouseholdRetentionProcessing.scala) recomputes its whole
output per run; batch ``dedup.duplicate_clusters`` is the parity
operator. This module is the beyond-reference maintenance shape: at
100 TB a corpus-wide connected-components pass per ingest batch is the
scale killer, while the union-find table below absorbs a window with
bounded point lookups and one keyed-sink commit.

Design — a persisted UNION-FIND FOREST on the keyed sink:

- storage: a keyed table (``doc_id`` → ``parent``, ``live``) written by
  ``build_cluster_table``. The invariant ``parent <= doc_id`` (labels
  are component minima) makes every pointer chain strictly decreasing —
  acyclic by construction.
- reads (``read_dedup_clusters``): resolve chains by pointer doubling
  (each round joins labels to their parents' labels — O(log chain)
  rounds, the same localCheckpoint'd loop as the batch operator), then
  RE-ROOT each component at its minimum LIVE member and drop components
  with fewer than two live members. Served-view contract: EXACT batch
  equality for insert-only streams; for update/delete streams the view
  is sound-but-possibly-COARSER — every batch cluster is contained in
  exactly one served cluster (pairs are never missed, docs never
  falsely split), but a mutation that severs a PAIR-BRIDGE (the only
  transitive link between two neighbors: X~A, A~Y, X≁Y, then A deleted
  OR updated away) leaves X and Y merged until reconciliation —
  union-find cannot unmerge. Insert equality and the coarsening bound
  are pinned in tests; ``compress``/rebuild reconcile exactly.
- maintenance (``streaming.index_sync.sync_dedup_clusters``): a CDC
  window's changed docs probe the SYNCED near-dup band index for their
  verified pairs; the touched docs' and neighbors' ROOTS resolve through
  batched point lookups (O(chain) bucket-pruned jobs, not scans); a
  driver-local union-find over the window-bounded pair graph emits one
  parent-pointer upsert per changed doc plus one PARTIAL row per merged
  root — merging two clusters re-points ONE row, never the members —
  committed in one sink publish with the cursor in the same commit's
  ``app_meta`` (exactly-once, the index manifests' discipline).
- departures: rows are written fully PATH-COMPRESSED (parent = the
  resolved root at commit time), so the only rows other rows ever route
  through are roots and former roots — tracked by the ``routed`` flag
  (set on a losing root at merge, cleared by compression). An updated
  doc whose new text leaves its cluster therefore DETACHES exactly
  whenever it is not a routing node (the overwhelming case); a routing
  node's departure stays conservative (membership lingers) because
  re-pointing its children would need a reverse index. Either way the
  doc's FORMER component keeps every union its old pairs ever
  justified: if the departing doc was a pair-bridge, its ex-neighbors
  stay merged (the coarsening contract above) — updates sever edges
  exactly like deletes do, and only compress/rebuild splits exactly.
- deletes: membership-only (``live = false``); the row REMAINS as a
  routing ghost so chains through it stay resolvable. The conservative
  trade, stated loudly: removing a BRIDGE document does not split the
  component the way a batch recompute would — union-find cannot unmerge.
  ``compress_dedup_clusters`` (path compression + ghost purge) tightens
  chains, drops unreferenced ghosts, and CLEARS routing flags (after it,
  every former root is detachable again); a periodic
  ``build_cluster_table`` rebuild reconciles splits exactly — the
  rebuild-as-purge discipline the other indexes already carry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sinks.upsert import (
    commit_app_meta,
    read_keyed_table,
    table_app_meta,
    upsert_parquet,
    write_keyed_table,
)
from . import dedup as D

__all__ = [
    "build_cluster_table",
    "read_dedup_clusters",
    "compress_dedup_clusters",
]

#: app-meta keys the CDC cursor rides (sink edition of the index
#: manifests' (epoch_stream, last_epoch) pair)
CLUSTER_STREAM_KEY = "cluster_epoch_stream"
CLUSTER_EPOCH_KEY = "cluster_last_epoch"

_MAX_LOOKUP_HOPS = 64  # runaway bound on driver-side root chasing


def build_cluster_table(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
    epoch: int | None = None,
    epoch_stream: str | None = None,
) -> None:
    """Bootstrap (or rebuild) the union-find table from a corpus
    snapshot: batch pairs → batch components → every clustered doc's row
    is fully path-compressed (``parent`` = its component's min id),
    live. Rebuild doubles as the exact reconciliation for the
    conservative-merge staleness deletes accumulate (see module doc).
    ``epoch``/``epoch_stream`` seed the CDC cursor in the same initial
    commit when the corpus came from a keyed table."""
    labels = D.duplicate_clusters(
        D.minhash_lsh_pairs(docs, text_col, id_col)
    ).select(
        F.col("doc_id"),
        F.col("cluster_id").cast("long").alias("parent"),
        F.lit(True).alias("live"),
        # bootstrap rows are fully compressed: the only routing targets
        # are the roots themselves (parent == self)
        (F.col("doc_id") == F.col("cluster_id")).alias("routed"),
    )
    app = None
    if epoch is not None:
        app = {CLUSTER_EPOCH_KEY: int(epoch)}
        if epoch_stream is not None:
            app[CLUSTER_STREAM_KEY] = str(epoch_stream)
    import shutil

    shutil.rmtree(path, ignore_errors=True)  # rebuild = replace
    write_keyed_table(labels, path, key="doc_id", n_buckets=n_buckets,
                      app_meta=app)


def _resolved(rows: DataFrame, max_iters: int = 25) -> DataFrame:
    """(doc_id, root, live) with every pointer chain fully resolved —
    pointer doubling: each round replaces a label with its label's
    label, halving chain depth; strictly-decreasing parents guarantee
    convergence. localCheckpoint per round for the same
    iterative-lineage reason as ``duplicate_clusters``."""
    labels = rows.select("doc_id", F.col("parent").alias("root"), "live")
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        hop = labels.select(
            F.col("doc_id").alias("_p"), F.col("root").alias("_pr")
        )
        nxt = (
            labels.join(hop, labels["root"] == hop["_p"], "left")
            .select(
                "doc_id",
                F.coalesce(F.col("_pr"), F.col("root")).alias("root"),
                "live",
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.root") != F.col("o.root"))
            .limit(1)
            .count()
        )
        labels = nxt
        if changed == 0:
            return labels
    raise RuntimeError(
        f"cluster pointer chains did not resolve in {max_iters} doubling "
        "rounds — run compress_dedup_clusters (or rebuild)"
    )


def read_dedup_clusters(spark: SparkSession, path: str) -> DataFrame:
    """The live cluster view: (doc_id, cluster_id, cluster_size) for
    every live member of a component with ≥2 live members, cluster_id
    re-rooted to the component's minimum LIVE doc id — the batch
    ``duplicate_clusters`` output shape over the live corpus. Exact
    batch equality for insert-only streams; updates/deletes that sever
    a pair-bridge serve a conservatively COARSER view until
    compress/rebuild (the soundness/coarsening contract in the module
    doc — both directions pinned in tests)."""
    res = _resolved(read_keyed_table(spark, path))
    live = res.where(F.col("live"))
    groups = live.groupBy("root").agg(
        F.min("doc_id").alias("cluster_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return (
        live.join(groups, "root")
        .where(F.col("cluster_size") >= 2)
        .select("doc_id", "cluster_id", "cluster_size")
    )


def _roots_by_lookup(spark, path: str, ids: list) -> dict:
    """Driver-side root resolution for a BOUNDED id set through the
    sink's point-lookup path: each hop is one bucket-pruned read of the
    ids whose roots are still unresolved — O(max chain) tiny jobs, never
    a table scan. Ids absent from the table are their own roots.
    Returns {id: {"root", "parent", "live", "routed"}} — parent/live/
    routed are the STORED values (None for absent ids) — for the asked
    ids AND every chain id the resolution visited: a caller re-pointing
    a LOSING ROOT needs that root's stored liveness even when the root
    itself was not in the window (defaulting it to live would resurrect
    a deleted doc's membership — review-of-review finding)."""
    parent: dict = {}
    meta: dict = {}
    frontier = sorted(set(ids))
    hops = 0
    while frontier:
        hops += 1
        if hops > _MAX_LOOKUP_HOPS:
            raise RuntimeError(
                "cluster root lookup exceeded the hop bound — run "
                "compress_dedup_clusters"
            )
        rows = (
            read_keyed_table(spark, path, keys=frontier)
            .select("doc_id", "parent", "live", "routed")
            .collect()
        )
        found = {r["doc_id"]: r for r in rows}
        nxt = set()
        for i in frontier:
            r = found.get(i)
            if r is None:
                parent[i] = i  # not in the table: its own root
                meta.setdefault(
                    i, {"parent": None, "live": None, "routed": None}
                )
            else:
                parent[i] = r["parent"]
                meta.setdefault(
                    i,
                    {
                        "parent": r["parent"],
                        "live": bool(r["live"]),
                        "routed": bool(r["routed"]),
                    },
                )
                if r["parent"] != i and r["parent"] not in parent:
                    nxt.add(r["parent"])
        frontier = sorted(nxt)

    def root_of(i):
        seen = []
        while parent.get(i, i) != i:
            seen.append(i)
            i = parent[i]
        for s in seen:  # path-compress the local map
            parent[s] = i
        return i

    # every asked id has a meta entry (both frontier branches set one),
    # so meta's key set IS ids ∪ visited-chain ids
    return {i: {**meta[i], "root": root_of(i)} for i in meta}


def apply_cluster_window(
    spark: SparkSession,
    path: str,
    ups: DataFrame,
    up_ids: list,
    del_ids: list,
    index_path: str,
    text_col: str,
    id_col: str,
    epoch: int,
    epoch_stream: str,
    expect_epoch: int | None,
) -> dict:
    """Fold one netted change window into the union-find table — ONE
    sink commit carrying the rows AND the cursor (``app_meta``), with
    ``app_meta_expect`` making a raced replay abort instead of
    double-applying. Exposed for the sync loop (streaming.index_sync);
    see the module doc for the algorithm."""
    expect = (
        {CLUSTER_EPOCH_KEY: int(expect_epoch)}
        if expect_epoch is not None
        else None
    )
    app = {
        CLUSTER_EPOCH_KEY: int(epoch),
        CLUSTER_STREAM_KEY: str(epoch_stream),
    }
    # the window's verified near-dup edges, driver-materialized as
    # (changed doc, NEIGHBOR ROOT) pairs deduped distributively BEFORE
    # the collect: a hot-clique window has O(docs × clique) raw pairs
    # (the thing that must never cross to the driver) but only
    # O(docs × touched components) distinct root edges — for a 10k-copy
    # clique that is 10k rows, not 100M. Neighbor ids themselves are
    # bounded by distinct touched docs, so the two collects here are
    # both O(changes)-shaped.
    edges: list = []
    nbr_ids: list = []
    probe = None
    if up_ids:
        idx = D.read_neardup_index(spark, index_path, id_col=id_col)
        probe = (
            D.neardup_probe(ups, idx, text_col=text_col, id_col=id_col)
            .select(id_col, "dup_of")
            .persist()
        )
        nbr_ids = [
            r["dup_of"] for r in probe.select("dup_of").distinct().collect()
        ]
    touched = sorted(set(up_ids) | set(del_ids) | set(nbr_ids))
    if not touched:  # probe is necessarily None here (up_ids was empty)
        commit_app_meta(path, app, expect)
        return {"upserted": 0, "deleted": 0, "merged_roots": 0}
    roots = _roots_by_lookup(spark, path, touched)
    up_set = set(up_ids)

    def detachable(i) -> bool:
        """An updated doc may leave its old component iff nothing can
        route through its row: rows are written path-compressed, so
        routing targets are exactly the current roots (parent == self)
        and flagged former roots (``routed``)."""
        m = roots[i]
        if m["parent"] is None:
            return True  # not in the table at all
        return m["parent"] != i and not m["routed"]

    def uf_start(i):
        """The union-find node a touched id begins at: itself when it is
        an updated doc free to leave its history behind, else its stored
        root. The edge targets below MUST use the same rule — mapping a
        window-internal pair to a detached doc's OLD root would re-attach
        its partner to the component the doc just left."""
        return i if (i in up_set and detachable(i)) else roots[i]["root"]

    if probe is not None:
        try:
            if nbr_ids:
                dup_type = dict(probe.dtypes)["dup_of"]
                root_df = spark.createDataFrame(
                    [(i, int(uf_start(i))) for i in nbr_ids],
                    f"dup_of {dup_type}, _nroot long",
                )
                edges = [
                    (r[id_col], r["_nroot"])
                    for r in probe.join(F.broadcast(root_df), "dup_of")
                    .select(id_col, "_nroot")
                    .distinct()
                    .collect()
                ]
        finally:
            probe.unpersist()

    # driver-local union-find over the window's pair graph, joined at
    # the EXISTING roots (O(window + neighbors), never O(table)); an
    # updated doc starts FRESH when detachable — its new text, not its
    # history, decides membership — and at its old root otherwise (the
    # conservative routing-node case, see module doc)
    uf = {}
    for i in touched:
        uf[i] = uf_start(i)
    for i in list(uf):  # include the roots themselves as nodes
        uf.setdefault(uf[i], uf[i])

    def find(x):
        while uf[x] != x:
            uf[x] = uf[uf[x]]
            x = uf[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            uf[hi] = lo

    for d, nroot in edges:
        union(d, nroot)
    # desired state per touched row, one entry per key (a doc can be an
    # upsert AND a losing root AND a delete target across the window's
    # edges — the dict folds those into one row, keyed-sink style).
    # Entries are [parent, live, routed], all explicit (the stored
    # complement is already in the lookup map, so no partial shapes):
    desired: dict = {}
    edge_docs = {d for d, _ in edges} | {n for _, n in edges}
    for i in up_ids:  # changed docs: live at their new root. The routed
        # flag is STICKY (cleared only by compression): rows may still
        # point at a formerly-routed doc, so a later update of it must
        # not make it look detachable
        p = int(find(i))
        if roots[i]["parent"] is None and i not in edge_docs and p == i:
            # pairless previously-ABSENT doc: no row. Writing one per
            # churned singleton trends the table toward O(all
            # ever-touched docs) instead of O(clustered docs) — advice
            # r12. The read view drops size-1 components anyway, and a
            # later window that pairs this doc writes its row then.
            continue
        desired[i] = [p, True, p == i or bool(roots[i]["routed"])]
    # probe NEIGHBORS absent from the table are live corpus docs that
    # were singletons until this window paired them (the band index
    # serves only live docs): they need membership rows too, or the
    # component's live count misses them and a 2-doc cluster reads as
    # size 1 and vanishes
    for nb in nbr_ids:
        if nb not in desired and roots[nb]["live"] is None:
            p = int(find(nb))
            desired[nb] = [p, True, p == nb]
    merged = 0
    for i in touched:
        r0 = roots[i]["root"]
        if r0 in up_set or r0 in desired:
            continue
        if r0 in uf and find(r0) != r0:
            # an existing root lost a union: re-point ONE row and FLAG
            # it (members still route through it); its liveness is
            # whatever it was (ghost roots keep routing)
            stored = roots.get(r0, {}).get("live")
            desired[r0] = [
                int(find(r0)),
                bool(stored) if stored is not None else True,
                True,
            ]
            merged += 1
    del_present = [
        i for i in del_ids if roots[i]["live"] is not None
    ]
    for i in del_present:  # membership off, routing row stays (resolved
        # root is a valid — further-compressed — parent under ≤)
        ent = desired.get(i)
        if ent is not None:
            ent[1] = False
        else:
            desired[i] = [
                int(roots[i]["root"]),
                False,
                bool(roots[i]["routed"]),
            ]
    if not desired:
        commit_app_meta(path, app, expect)
        return {"upserted": 0, "deleted": 0, "merged_roots": 0}
    updates = spark.createDataFrame(
        [(i, p, lv, rt) for i, (p, lv, rt) in sorted(desired.items())],
        "doc_id long, parent long, live boolean, routed boolean",
    )
    upsert_parquet(
        spark, path, updates, key="doc_id",
        app_meta=app, app_meta_expect=expect,
    )
    return {
        # actually-applied semantics (the sync family's contract): an
        # upserted doc that wrote no row (pairless absent singleton)
        # does not count
        "upserted": sum(1 for i in up_ids if i in desired),
        "deleted": len(del_present),
        "merged_roots": merged,
    }


def compress_dedup_clusters(spark: SparkSession, path: str) -> dict:
    """Path compression + ghost purge: every row re-points directly at
    its resolved root re-rooted to the min LIVE member (chains shrink to
    ≤1 hop, so sync lookups and reads stay O(1)-ish until drift rebuilds
    them), and ghost rows (live=false) are dropped — after full
    compression nothing routes through them. A component with NO live
    members disappears entirely. Returns {"repointed": n, "purged": n}.

    OPTIMISTIC like every maintenance op here: both commits (the
    repoint upsert, the ghost purge) carry ``app_meta_expect`` on the
    CDC cursor the plan was computed from — a racing
    ``sync_dedup_clusters`` bumps that cursor in its own commit, so a
    stale compression aborts with ``ConcurrentWriteError`` instead of
    silently overwriting a merge or purging a just-resurrected row
    (review finding). A race between the two commits aborts the purge
    only — ghosts are then merely unpurged, retry when quiet. A table
    that has never synced carries no cursor and falls back to the
    single-maintainer contract the index ops already state."""
    from ..sinks.upsert import delete_keys

    app0 = table_app_meta(path)
    expect = (
        {CLUSTER_EPOCH_KEY: app0[CLUSTER_EPOCH_KEY]}
        if app0.get(CLUSTER_EPOCH_KEY) is not None
        else None
    )
    res = _resolved(read_keyed_table(spark, path))
    live_roots = (
        res.where(F.col("live"))
        .groupBy("root")
        .agg(F.min("doc_id").alias("_new_root"))
    )
    target = res.join(live_roots, "root", "left").select(
        "doc_id",
        F.coalesce(F.col("_new_root"), F.col("root")).alias("_tgt"),
        "live",
    )
    # skip no-op rows: rewrite only where the stored parent differs or a
    # stale routing flag can be cleared (after full compression nothing
    # routes through former roots, so they become detachable again)
    cur = read_keyed_table(spark, path).select(
        "doc_id",
        F.col("parent").alias("_cur"),
        F.col("routed").alias("_rt"),
    )
    updates = (
        target.where(F.col("live"))
        .join(cur, "doc_id")
        .where(
            (F.col("_cur") != F.col("_tgt"))
            | (F.col("_rt") != (F.col("doc_id") == F.col("_tgt")))
        )
        .select(
            "doc_id",
            F.col("_tgt").cast("long").alias("parent"),
            F.lit(True).alias("live"),
            (F.col("doc_id") == F.col("_tgt")).alias("routed"),
        )
    )
    n_repoint = updates.count()
    if n_repoint:
        upsert_parquet(
            spark, path, updates, key="doc_id", app_meta_expect=expect
        )
    ghosts = res.where(~F.col("live")).select("doc_id")
    n_ghosts = ghosts.count()
    if n_ghosts:
        delete_keys(
            spark, path, ghosts, key="doc_id", app_meta_expect=expect
        )
    return {"repointed": int(n_repoint), "purged": int(n_ghosts)}


def cluster_cursor(path: str, stream: str) -> int | None:
    """The table's committed CDC cursor for ``stream`` (None when the
    table tracks a different stream or was never synced)."""
    app = table_app_meta(path)
    if (
        app.get(CLUSTER_STREAM_KEY) == stream
        and app.get(CLUSTER_EPOCH_KEY) is not None
    ):
        return int(app[CLUSTER_EPOCH_KEY])
    return None
