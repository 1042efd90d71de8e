"""Pin the registry-ordering contract.

The driver's correctness harness oracle-checks only the FIRST 50 ``queries()``
entries in insertion order (observed: CORRECTNESS_r01/r02.json keys are exactly
the first 50 registry keys).  Round 2 accidentally pushed every LLM-pipeline
proving query past the window; this test makes that a hard failure instead of a
silent coverage loss.
"""

from commerce_data_pipeline_spark.queries import REGISTRY, oracle_sql, queries

CHECK_WINDOW = 50

# One proving query per operator family that MUST sit inside the checked window.
#
# r9 reset (VERDICT r8 directive #5): r8 closed the attested-ever gap, so
# the r9 window's job is FRESHNESS — rotate the stalest attestations
# (r2-r4-latest) back under the driver's oracle. The pin set shrinks to
# one proof per family, chosen FROM the stale rotate-ins wherever a
# family has one (those pins are both the family floor and the freshness
# payload); only the six families with no stale representative keep an
# r8-attested pin. The r8 pin-set's full rationale history lives in git
# (this file @ 8c40dcb).
# r12 reset (VERDICT r11 directive #3): the window is the ROTATION
# PAYLOAD — all 43 r8-latest + both r7-latest attestations — so pins are
# chosen FROM the rotate-ins wherever the family has one. Families whose
# every member is already fresh (attested ≥ r9: X8 bloom, X10 corpus,
# bronze P5/P6, core-G funnel/sessionization, core-streaming daily
# counts) cede their per-round pin slot to the payload this round —
# the pin exists to keep a family's freshness above the bar, and those
# families are above it without a slot. Prior pin-set rationale history
# lives in git.
# r15 reset (VERDICT r14 #1/#6): the window is the rotation payload —
# promo_revenue LEADING (the named r10-tier overflow, due after two held
# rounds) + the never-attested ann_rebalance_gate + 46 of the 48
# r11-latest attestations (ann_pq + bigram_lm are the named overflows to
# r16 — 52 candidates for 50 slots) + the 2 single-query families — so
# pins are chosen FROM those rotate-ins wherever a family has one.
# Families whose every member is fresh (attested ≥ r12 after the green
# r14 run: the r12-r14 tiers — exact/LSH dedup, multimodal md-twins'
# in-window siblings, sketches, bloom decontamination, X9 resample,
# attribution/cohorts, stream interval join, X13 KS drift) cede their
# pin slot to the payload, per the standing precedent. Prior pin-set
# rationale history lives in git.
FAMILY_PROOFS = {
    # R relational: the NAMED overflow lead (Q14 conditional monthly
    # share) + the Q1-shape agg sweep + the Q5-shape star join
    "promo_revenue",
    "pricing_summary",
    "top_revenue_nations",
    # X3 ANN: the NEW end-to-end gated-rebalance verdict row + IVF-routed
    # top-k + integer-exact centroid audit
    "ann_rebalance_gate",
    "ann_ivf",
    "centroid_sim",
    # X2 near-dup: asymmetric containment + the MinHash accuracy
    # contract + cross-source duplication audit + SemDeDup prune
    "containment_topk",
    "minhash_estimate_audit",
    "dup_source_matrix",
    "semantic_dedup",
    # record linkage: sorted-neighborhood candidate pass
    "snm_name_pairs",
    # X4 text: lang-ID/quality + tokenizer last mile + fertility +
    # exact-substring spans
    "text_profile",
    "bpe_tokenize",
    "tokenizer_fertility",
    "dup_ngram_spans",
    # X5 multimodal: the integer md5 twins of the pHash family
    "image_phash_md5",
    "image_near_dup_md5",
    "media_features_md5",
    # X6 sketches: exact heavy hitters via Misra-Gries candidates
    "heavy_hitters",
    # X7 search: TF-IDF keywords + hybrid BM25+semantic RRF fusion
    "tfidf_keywords",
    "hybrid_search_rrf",
    # X8 bloom: measured-FPR-vs-bound contract
    "bloom_fpr",
    # X10 corpus shaping: temperature mixing + greedy packing + epoch
    # shuffle + weighted sampling
    "temperature_mix",
    "greedy_pack",
    "epoch_shuffle",
    "weighted_sample",
    # X11 selection: DSIR importance resampling + percentile calibration
    # + MMR rerank + hard-negative mining
    "dsir_select",
    "quality_calibrate",
    "mmr_rerank",
    "hard_negatives",
    # X12 graph: personalized-PageRank seed expansion
    "seed_expansion",
    # X13 audits: PSI + bounded-JS drift over the shared decile banding
    "value_psi_drift",
    "value_js_drift",
    # P pipeline: date discovery + anti-join gaps + pre-join audit +
    # robust outliers
    "distinct_ship_dates",
    "date_gaps",
    "join_profile",
    "price_outliers",
    # temporal: SCD2 intervals + as-of lookup + recency decay
    "scd2_intervals",
    "scd2_lookup",
    "decayed_revenue",
    # skew mitigation (single-query family — must always sit in-window)
    "salted_hot_join",
    # §4 layout (single-query family — must always sit in-window)
    "zorder_skipping",
    # G analytics: ordered funnel + gap sessionization + conversion
    # metrics + JSON param extraction
    "funnel",
    "sessionization",
    "conversion_daily",
    "param_extract",
    # streaming twin: tumbling-window agg (batch parity)
    "streaming_daily_counts",
}

def test_every_family_proof_inside_check_window():
    window = set(list(REGISTRY)[:CHECK_WINDOW])
    missing = sorted(FAMILY_PROOFS - window)
    assert not missing, (
        f"proving queries outside the driver's {CHECK_WINDOW}-entry window: {missing}"
    )


def test_every_window_entry_has_an_oracle():
    """Round-4 tightening: no window slot may be spent on a rows-only check.

    Rows-only fast-path twins (simhash, ann_lsh, pHash family, approx
    sketches) live past position 50; their evidence is the in-window
    oracle-checked md5 twin plus pytest accuracy pins.
    """
    window = list(REGISTRY)[:CHECK_WINDOW]
    no_oracle = [k for k in window if REGISTRY[k].oracle is None]
    assert not no_oracle, f"window entries without oracle SQL: {no_oracle}"


def test_registry_and_entrypoints_agree():
    assert list(queries()) == list(REGISTRY)
    # every oracle key is a registry key
    assert set(oracle_sql()) <= set(REGISTRY)


def test_rebind_load_table_reaches_every_consumer_module():
    """r10 ADVICE (medium): the stress harness scales tables by rebinding
    each query module's `load_table`; a queries submodule that calls
    load_table but is missing from _QUERY_MODULES would silently read
    UNSCALED tables at k× stress (the r6 stale-scale bug class —
    _shared._ensure_copurchase_pairs was the reintroduced instance).
    Mechanically pin: every queries.* module whose source references
    load_table is in the rebind tuple."""
    import inspect

    import commerce_data_pipeline_spark.queries as Q

    rebindable = set(Q._QUERY_MODULES)
    for mod in list(Q._QUERY_MODULES) + [Q._shared]:
        assert hasattr(mod, "load_table"), mod.__name__
    import pkgutil

    pkg = Q
    missing = []
    for info in pkgutil.iter_modules(pkg.__path__):
        mod = __import__(
            f"commerce_data_pipeline_spark.queries.{info.name}",
            fromlist=["_"],
        )
        src = inspect.getsource(mod)
        if "load_table(" in src and mod not in rebindable:
            missing.append(info.name)
    assert not missing, (
        f"queries modules calling load_table but absent from _QUERY_MODULES: {missing}"
    )

    sentinel = object()
    orig = Q.load_table
    Q.rebind_load_table(sentinel)
    try:
        assert Q._shared.load_table is sentinel
    finally:
        Q.rebind_load_table(orig)


def test_no_non_terminal_query_stranded_without_attestation():
    """VERDICT r7 directive #7: the cumulative-attestation ledger
    (tools/attestation_ledger.py over the CORRECTNESS_r*.json union)
    must show zero non-terminal queries that (a) have never been
    driver-attested AND (b) sit outside the current 50-entry window —
    i.e. every registry query is either attested-ever, declared
    terminal, or will be attested by this round's driver run."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "attestation_ledger",
        os.path.join(os.path.dirname(__file__), "..", "tools", "attestation_ledger.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    s = mod.summary()
    assert not s["uncovered"], (
        "never-attested non-terminal queries stranded outside the window: "
        f"{s['uncovered']}"
    )
