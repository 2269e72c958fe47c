"""Round-5 additions: stateful-streaming driver row, learned-centroid
IVF, digest-suite drift guard."""

from __future__ import annotations

import pytest

from mathorcup_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def test_st_stateful_suite_self_asserts(spark):
    """The suite raises on any stream/batch mismatch; a green return
    must carry match=1 on every check."""
    registry._bootstrap()
    rows = registry.REGISTRY["st_stateful_suite"].fn(spark, SF_DIR).collect()
    assert {r["check"] for r in rows} == {
        "apply_in_pandas_with_state",
        "tumbling_readstream",
        "checkpoint_restart",
        "index_ingest_convergence",
        "index_ingest_probe_parity",
        "ann_ingest_convergence",
        "ann_ingest_probe_parity",
        "stream_stream_join",
        "verdict_ingest_maintenance",
        "ewma_stateful_restatement",
    }
    assert all(r["match"] == 1 and r["n_mismatch"] == 0 for r in rows)


def test_kmeans_ivf_beats_fair_seeded_baseline(spark):
    """Learned (spherical-KMeans) centroids must match or beat the
    FAIR seeded baseline — first-K seeding with seeds disjoint from
    the query batch. (The registered sim_ivf_ann's ~0.86 recall is
    inflated by query==seed overlap; see the query doc.)"""
    registry._bootstrap()
    # round 7: the query itself RAISES if kmeans loses to the fair
    # baseline or misses its recall floors, and returns (check, n_keys,
    # n_mismatch, ok) rows pinned by its DuckDB oracle — a clean run
    # with all ok=1 IS the beats-fair-baseline assertion
    rows = {
        r["check"]: (r["n_mismatch"], r["ok"])
        for r in registry.REGISTRY["ml_kmeans_ivf_ann"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {
        "kmeans_recall_floor",
        "kmeans_ge_disjoint_seeding",
        "seeded_anchor_floor",
    }
    assert all(v == (0, 1) for v in rows.values())


def test_digest_declared_columns_must_match_member_schema(spark):
    """A digest member whose schema drifts from the declared column
    list fails loudly (the full-width coverage contract)."""
    from mathorcup_spark.operators.digest import _digest_suite

    _, fn = _digest_suite(
        [("histogram", "a_histogram", [("bin", "num")])]  # missing "n"
    )
    with pytest.raises(AssertionError, match="declared columns"):
        fn(spark, SF_DIR).collect()


def test_every_oracled_query_fully_driver_covered(spark):
    """The round-5 evidence contract: every oracled registry query is
    driver-verified over ALL of its output columns — it is on the
    surface itself, a full-width digest member, or a slot-suite
    member whose every output column appears in its slot mapping.
    A future member added with uncovered columns fails here."""
    import re

    registry._bootstrap()  # must precede the digest import: its
    # suite oracles are built from already-registered members

    from mathorcup_spark.operators import digest as dg

    slot_members: dict[str, str] = {}
    src = open("mathorcup_spark/operators/suites.py").read()
    pat = re.compile(
        r'\(\s*"[^"]+",\s*"([a-z0-9_]+)",\s*\{(.*?)\}\s*\)', re.DOTALL
    )
    for q, body in pat.findall(src):
        exprs = " ".join(v for _, v in re.findall(r'"([a-z0-9_]+)":\s*"([^"]*)"', body))
        slot_members[q] = slot_members.get(q, "") + " " + exprs

    digest_members = {
        q
        for mlist in (dg._AGG_MEMBERS, dg._LAKE_MEMBERS, dg._SPECIALTY_MEMBERS)
        for _, q, _cols in mlist
    }
    surface = set(registry.DRIVER_SURFACE)

    # Round-9 check-row queries: each runs a member-check function
    # that a DRIVER-SURFACE suite composes verbatim (same shared
    # code, same (check, n_keys, n_mismatch, ok) row schema), so the
    # suite's hashed driver row IS full-width coverage of the
    # member's output. Verified programmatically — a member dropped
    # from the shared check table breaks this set, not just a string.
    from mathorcup_spark.ml.checks import MEMBER_CHECKS
    from mathorcup_spark.operators.sampling import SEEDED_MEMBERS

    assert set(MEMBER_CHECKS) == {
        "word2vec", "gbt_regression", "logreg_classifier",
        "multitask_bundle", "scaler", "train_val_select",
        "checkpoint_roundtrip", "als_recommender",
    }
    assert set(SEEDED_MEMBERS) == {"exact_n", "fraction", "split_marker"}
    checkrow_covered = {
        # composed into ml_pipeline_suite (driver surface)
        "ml_word2vec_embeddings", "ml_gbt_price_regression",
        "ml_logreg_sold_classifier", "ml_multitask_bundle",
        "ml_scaler_fit_transform", "ml_train_validation_select",
        "ml_checkpoint_roundtrip", "ml_als_recommend",
        # composed into r_seeded_suite (driver surface)
        "r_exact_n_sample", "r_fraction_sample", "r_random_split_marker",
    }
    assert {"ml_pipeline_suite", "r_seeded_suite"} <= surface

    uncovered = {}
    for name, q in registry.REGISTRY.items():
        if (
            q.oracle is None
            or name in surface
            or name in digest_members
            or name in checkrow_covered
        ):
            continue
        if name not in slot_members:
            uncovered[name] = "not a member of any driver suite"
            continue
        cols = q.fn(spark, SF_DIR).columns
        ids = set(re.findall(r"[a-z_][a-z0-9_]*", slot_members[name]))
        missing = [c for c in cols if c not in ids]
        if missing:
            uncovered[name] = f"columns {missing} not in slot mapping"
    assert not uncovered, f"oracled queries lacking full driver coverage: {uncovered}"


def test_sessionize_invariants(spark):
    """Gap-sessionization semantic contract, checkable from the output
    alone: sessions exactly partition the event stream, session ids
    are contiguous per user, and consecutive sessions of one user are
    separated by MORE than the 6h threshold (otherwise they would have
    been one session)."""
    from mathorcup_spark.catalog import load
    from mathorcup_spark.operators.temporal import _SESSION_GAP_US

    registry._bootstrap()
    rows = registry.REGISTRY["ev_sessionize"].fn(spark, SF_DIR).collect()
    n_events_total = load(spark, SF_DIR, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events_total

    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for sessions in by_user.values():
        sessions.sort(key=lambda r: r["session_seq"])
        assert [r["session_seq"] for r in sessions] == list(
            range(1, len(sessions) + 1)
        )
        for prev, nxt in zip(sessions, sessions[1:]):
            assert nxt["start_us"] - prev["end_us"] > _SESSION_GAP_US
            assert prev["duration_us"] == prev["end_us"] - prev["start_us"]
            assert 1 <= prev["n_event_types"] <= prev["n_events"]


def test_containment_dominates_jaccard(spark):
    """|A∩B|/|A| >= |A∩B|/|A∪B| for every pair (containment can only
    exceed resemblance), both directions bounded to [0,1], and the
    pair sets of d_containment / d_ngram_jaccard are identical (same
    candidate contract)."""
    registry._bootstrap()
    cont = {
        (r["doc_a"], r["doc_b"]): r
        for r in registry.REGISTRY["d_containment"].fn(spark, SF_DIR).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in registry.REGISTRY["d_ngram_jaccard"].fn(spark, SF_DIR).collect()
    }
    assert cont.keys() == jac.keys() and cont
    for pair, r in cont.items():
        ca, cb, j = r["containment_a"], r["containment_b"], jac[pair]
        for c in (ca, cb):
            if c is not None:
                assert 0.0 <= c <= 1.0
                # rounding to 6dp can perturb each side by <=5e-7
                assert j is None or c >= j - 1e-6
