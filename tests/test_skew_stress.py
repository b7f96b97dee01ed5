"""Skew stress: one mega-household holding most encounters — the hot-key
shape that breaks naive band self-joins at scale (quadratic blowup inside
one key). The window strategy must (a) agree exactly with the literal
self-join strategy and (b) not amplify rows (the self-join materializes
O(k²) pairs for a k-encounter household; the window pass stays O(k))."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from es_household_retention_spark_job_spark.operators import retention as R

AS_OF = datetime(2026, 8, 1, tzinfo=timezone.utc)


def _skewed_frames(spark, hot_encounters: int = 5000, cold_households: int = 50):
    ms_day = 86400000
    base_ms = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1000)
    hot = [
        ("PH", "HOT", base_ms + (i % 700) * ms_day + i)  # ~700 distinct days
        for i in range(hot_encounters)
    ]
    cold = [
        (f"PC{h}", f"C{h}", base_ms + (h % 300) * ms_day)
        for h in range(cold_households)
    ]
    rows = [
        (f"E{i}", pid, "DEMO", ms) for i, (pid, _, ms) in enumerate(hot + cold)
    ]
    encounter = spark.createDataFrame(
        rows, "encounter_id string, person_id string, client_code string, admit_date long"
    )
    people = {pid: hh for pid, hh, _ in hot + cold}
    person = spark.createDataFrame(
        [(pid, hh) for pid, hh in people.items()], "person_id string, household_id string"
    )
    return person, encounter


def test_window_strategy_matches_selfjoin_under_skew(spark):
    person, encounter = _skewed_frames(spark)
    enc = R.eligible_encounters(encounter, "DEMO", AS_OF)
    admits = R.person_encounter_admits(person, enc)

    by_window = R.retained_months(admits, strategy="window")
    by_selfjoin = R.retained_months(admits, strategy="selfjoin")
    assert by_window.exceptAll(by_selfjoin).count() == 0
    assert by_selfjoin.exceptAll(by_window).count() == 0

    # the hot household is bounded by the 49-month grid downstream: the
    # retained-months output itself is at most #distinct admit months
    hot_months = by_window.where(F.col("household_id") == "HOT").count()
    assert 0 < hot_months <= 49


def test_full_pipeline_under_skew_completes_and_is_sane(spark):
    person, encounter = _skewed_frames(spark)
    months = R.month_grid(spark, AS_OF)
    enc = R.eligible_encounters(encounter, "DEMO", AS_OF)
    admits = R.person_encounter_admits(person, enc)
    retained = R.retained_months(admits)
    base = R.retention_base(person, retained, months)
    collapsed = R.collapse_retention(base, AS_OF)
    rows = collapsed.collect()
    per_hh: dict[str, list] = {}
    for r in rows:
        per_hh.setdefault(r.household, []).append(r)
    # every household has ranges; the grid bound caps ranges per household
    assert set(per_hh) == {r.household_id for r in person.collect()}
    assert all(1 <= len(v) <= 49 for v in per_hh.values())
    hot = sorted(per_hh["HOT"], key=lambda r: r.start_date)
    assert any(r.retained for r in hot)  # dense daily admits → retained runs


def test_skew_safe_dedup_equals_default(spark):
    """The skew escape hatch (dedup shuffled on the full compound key before
    the household exchange) must be a pure plan change: identical rows, and
    one extra exchange at most."""
    from es_household_retention_spark_job_spark import plans as P

    person, encounter = _skewed_frames(spark, hot_encounters=8000)
    enc = R.eligible_encounters(encounter, "DEMO", AS_OF)
    default = R.person_encounter_admits(person, enc, skew_safe=False)
    safe = R.person_encounter_admits(person, enc, skew_safe=True)
    assert default.exceptAll(safe).count() == 0
    assert safe.exceptAll(default).count() == 0
    # the full phase-1 output is unchanged too
    base_d = R.retention_base(
        person, R.retained_months(default), R.month_grid(spark, AS_OF)
    )
    base_s = R.retention_base(person, R.retained_months(safe), R.month_grid(spark, AS_OF))
    c_d = R.collapse_retention(base_d, AS_OF)
    c_s = R.collapse_retention(base_s, AS_OF)
    assert c_d.exceptAll(c_s).count() == 0
    assert c_s.exceptAll(c_d).count() == 0
    # cost bound: exactly one extra exchange for the skew-safe pre-dedup
    assert P.count_shuffles(safe) == P.count_shuffles(default) + 1


def test_ngram_jaccard_hot_shingle_candidates_bounded(spark):
    """The df cap keeps one boilerplate shingle shared by hundreds of docs
    from going quadratic in the inverted-index self-join: candidate count
    must be bounded by the docs' RARE-shingle overlaps, not the hot
    shingle's m² — and genuinely-similar pairs still surface with exact
    scores."""
    from es_household_retention_spark_job_spark.operators import dedup as D

    n_docs = 400
    header = "terms of service apply to all content herein"  # 1 hot shingle set
    rows = []
    for i in range(n_docs):
        # unique body per doc — no rare-shingle overlap across docs
        body = " ".join(f"tok{i}x{j}" for j in range(12))
        rows.append((i, f"{header} {body}"))
    # one genuinely near-duplicate pair sharing a long rare tail
    dup_tail = " ".join(f"shared{j}" for j in range(40))
    rows.append((9001, f"alpha {dup_tail}"))
    rows.append((9002, f"omega {dup_tail}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    grams = D.shingle_sets(docs)
    # naive (uncapped) candidate space would include all C(400,2) = 79 800
    # hot-header pairs; the cap must exclude every one of them
    cand = D.ngram_candidate_pairs(grams, max_df=50).collect()
    assert len(cand) == 1, f"expected only the rare-tail pair, got {len(cand)}"
    assert (cand[0].doc_a, cand[0].doc_b) == (9001, 9002)

    pairs = D.ngram_jaccard_pairs(docs, min_bp=5000, max_df=50).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(9001, 9002)]
    # exact score over FULL shingle sets (cap affects candidates only):
    # both docs have 7 header + 1 bridge + 38 tail shingles = 46 distinct;
    # intersection = 7 header + 38 tail = 45... compute from the data instead
    a = {r.doc_id: set(r.gh) for r in grams.where("doc_id >= 9001").collect()}
    inter = len(a[9001] & a[9002])
    union = len(a[9001] | a[9002])
    assert pairs[0].jaccard_bp == inter * 10000 // union
