"""The driver checks a bounded prefix of ``queries()`` (round 1: first 50),
so emission order is coverage policy: every SURVEY §2/§2C family must land
inside the first 50 slots; the TPC-H extras go last.
"""

import re

import __spark_entry__ as entry
from philotes_spark import registry

registry.load_all()


def test_families_inside_driver_window():
    head = list(entry.queries())[:50]
    for family in (
        "b2_",
        "b9_",
        "cdc_",
        "w_",
        "dedup_",
        "sim_",
        "text_",
        "snapshot_",
        "stream_",
        "multimodal_meta",
        # A27-A29 ops operators, promoted r04 so the driver hard-verifies
        # metrics aggregation / alerting / scaling for the first time
        "metric_",
        "alert_",
        "scaling_",
        # funnel_conversion rotated below the window r16 — the
        # conditional-aggregation shape stays window-green via
        # a8_buffer_stats + dq_constraint_report (and pivot_daily_
        # event_matrix, rotated below r08, was already covered the same
        # way); text_pii_redact rotated below the window r13 — its
        # per-doc JVM regexp-projection shape stays window-green via
        # text_quality_stats + scalar_functions
    ):
        assert any(n.startswith(family) for n in head), family


def test_r13_rotation_composition():
    # VERDICT r12 #1: the four r12 tier-8 additions graduate into the
    # driver's 50-slot window (snapshot_expired_chain_read,
    # snapshot_partition_evolution_read, dedup_minhash_portable,
    # dedup_simhash_portable); four duplicate-coverage slots move below
    # it (show_create_events — B1/A33 stay window-green via
    # b1_describe_columns; snapshot_delete_update — row-level DML via the
    # strictly-richer snapshot_merge_clauses + the externally-read
    # snapshot_delete_manifests_read; snapshot_refs — branch/tag
    # lifecycle via snapshot_wap_statements, $-tables via
    # snapshot_meta_sql + snapshot_schema_history; text_pii_redact —
    # per-doc JVM regexp projection via text_quality_stats +
    # scalar_functions), and earlier graduates/evictees hold their
    # positions (evictees stay oracle-gated in pytest)
    head = set(list(entry.queries())[:50])
    for n in (
        "w_rank_family",  # r07 graduates stay in
        # (q_recursive_hierarchy — r07 graduate — rotated below in r16;
        # see test_r16_rotation_composition)
        "dq_constraint_report",
        "snapshot_merge_clauses",  # r08 graduates stay in
        # (snapshot_schema_history, snapshot_meta_sql and
        # snapshot_insert_overwrite — r08/r09 graduates — rotated below
        # in r15/r16; see test_r15/r16_rotation_composition)
        "train_stratified_sample",
        "snapshot_ctas",
        "snapshot_wap_statements",
        "snapshot_widen_column",  # r10 graduate
        "snapshot_name_mapping_read",  # r11 graduates (r10 flagships;
        # snapshot_rewrite_late_appends rotated below in r15)
        "snapshot_delete_manifests_read",  # r12 graduates (r11 flagships)
        "snapshot_evolution_mor_read",
        # (the r13 graduates — snapshot_expired_chain_read,
        # snapshot_partition_evolution_read, dedup_minhash_portable,
        # dedup_simhash_portable — were window-PASSed in CORRECTNESS_r13
        # and rotated below in r14; see test_r14_rotation_composition)
        # the shapes that keep the evictees' coverage window-green
        "b1_describe_columns",
        "b7_daily_rollup",
        "metric_range_daily",
        "stream_session_counts",
        "b10_latest_by_key",
        "cdc_normalize",
        "text_quality_stats",
        "scalar_functions",
    ):
        assert n in head, n
    for n in (
        "b16_freshness",  # r07 evictees stay out
        "w_moving_avg",
        "cdc_op_rollup",
        "multimodal_frames",
        "sim_threshold_pairs",
        "b3_count_star",  # r08 evictees stay out
        "b4_recent_filter",
        "b8_top_n",
        "token_counts_by_source",
        "doc_fingerprint",
        "pivot_daily_event_matrix",
        "cdc_lsn_roundtrip",  # r09 evictees (duplicate coverage)
        "text_langid",
        "snapshot_history",
        "w_topn_per_group",
        "snapshot_update_unfiltered",  # r10 evictee (dup DML coverage)
        "stream_tumbling_counts",  # r11 evictees (duplicate coverage)
        "cdc_latest_state",
        "snapshot_positional_delete",  # r12 evictees (duplicate coverage)
        "snapshot_alter_columns",
        "show_create_events",  # r13 evictees (duplicate coverage)
        "snapshot_delete_update",
        "snapshot_refs",
        "text_pii_redact",
    ):
        assert n not in head, n


def test_r14_rotation_composition():
    # VERDICT r13 #1: five r13 tier-8 additions graduate into the 50-slot
    # window — snapshot_partition_transforms_read +
    # snapshot_write_order_read (the r13 headline capabilities: the full
    # Iceberg transform set with transform pruning, and write-order
    # evolution), sim_filtered_topk (predicate-pushed exact ANN), and the
    # two portable ANN twins sim_lsh_portable + sim_ivfpq_portable (first
    # in-window hash signal for the hyperplane-LSH and composed IVF-PQ
    # constructions). Five r13-hard-verified duplicate-coverage slots
    # move below it: dedup_minhash_portable + dedup_simhash_portable
    # (banded-bucket-join / bit-vote shapes stay window-green via
    # dedup_ngram_jaccard + sim_lsh_portable), snapshot_expired_chain_read
    # (chain-walk external reads via snapshot_delete_manifests_read +
    # snapshot_evolution_mor_read), snapshot_partition_evolution_read
    # (strictly subsumed by snapshot_partition_transforms_read), and
    # multimodal_jpeg_stats (Arrow-batched binary mapInPandas via
    # multimodal_meta). All five evictees stay oracle-gated in
    # tests/test_queries_oracle.py.
    head = set(list(entry.queries())[:50])
    for n in (
        "snapshot_partition_transforms_read",
        "snapshot_write_order_read",
        "sim_filtered_topk",
        # (sim_lsh_portable and sim_ivfpq_portable — r14 graduates,
        # PASSed in CORRECTNESS_r14 — rotated below in r15; see
        # test_r15_rotation_composition)
    ):
        assert n in head, n
    for n in (
        "dedup_minhash_portable",
        "dedup_simhash_portable",
        "snapshot_expired_chain_read",
        "snapshot_partition_evolution_read",
        "multimodal_jpeg_stats",
        "sim_filtered_ivf_topk",
    ):
        assert n not in head, n


def test_r15_rotation_composition():
    # VERDICT r14 next-round #2: five r14 tier-8 additions graduate into
    # the 50-slot window — snapshot_partial_rewrite_read (the paced
    # partial-progress rewrite read mid-rewrite, re-predicated
    # SF-relatively after the r14 vacuity finding),
    # snapshot_manifests_meta ($manifests hash-compared against hulls
    # recomputed from the source), dedup_semantic_portable (SemDeDup
    # cluster-bounded embedding dedup), and sim_ivf_portable +
    # sim_pq_portable (own in-window signal for the two halves the
    # composed IVF-PQ verified in r14). Five duplicate-coverage slots
    # move below: sim_ivfpq_portable (the composition of the graduating
    # halves), sim_lsh_portable (bucket equi-join via sim_ivf_portable +
    # dedup_ngram_jaccard), snapshot_meta_sql ($-table SQL via
    # snapshot_manifests_meta + snapshot_schema_history),
    # snapshot_insert_overwrite (statement surface via snapshot_ctas +
    # snapshot_wap_statements + snapshot_widen_column),
    # snapshot_rewrite_late_appends (MoR deltas via
    # snapshot_delete_manifests_read + snapshot_evolution_mor_read).
    # All five evictees stay oracle-gated in tests/test_queries_oracle.py.
    head = set(list(entry.queries())[:50])
    for n in (
        "snapshot_partial_rewrite_read",
        "snapshot_manifests_meta",
        "dedup_semantic_portable",
        "sim_ivf_portable",
        "sim_pq_portable",
        # the two r14 flagships whose r14 slots were empty-set-trivial
        # stay IN-window, now SF-relatively predicated (non-empty at
        # every fixture SF — test_window_queries_nonempty_driver_sf)
        "snapshot_partition_transforms_read",
        "snapshot_write_order_read",
    ):
        assert n in head, n
    for n in (
        "sim_ivfpq_portable",
        "sim_lsh_portable",
        "snapshot_meta_sql",
        "snapshot_insert_overwrite",
        "snapshot_rewrite_late_appends",
    ):
        assert n not in head, n


def test_r16_rotation_composition():
    # VERDICT r15 next-round #2: the four r15 tier-8 additions graduate
    # into the 50-slot window — snapshot_tighten_read (the complete
    # paced-recluster lifecycle: partial-progress rewrite + the tighten
    # merge pass to value-disjoint files), snapshot_entries_meta (the
    # $entries metadata table audited against source-slice counts),
    # snapshot_cherrypick_read (the diverged-main WAP completion:
    # fast_forward refusal + cherrypick re-apply) and
    # snapshot_ts_prune_read (TIMESTAMP file-stat pruning, kept < total
    # asserted in-query). Four duplicate-coverage slots move below:
    # snapshot_schema_history ($-table surface via snapshot_manifests_meta
    # + the graduating snapshot_entries_meta; evolution journal via
    # snapshot_widen_column + snapshot_name_mapping_read +
    # snapshot_evolution_mor_read), text_dup_ngram_fraction (Arrow-fold
    # per-doc text shape via its twin text_repetition_stats; hashed
    # n-grams via dedup_ngram_jaccard), funnel_conversion (conditional
    # aggregation via a8_buffer_stats + dq_constraint_report),
    # q_recursive_hierarchy (iterative driver-loop convergence via the
    # strictly-harder dedup_connected_components). All four evictees
    # stay oracle-gated in tests/test_queries_oracle.py. The r16
    # date-prune twin (snapshot_date_prune_read) sits tier-8 below the
    # window as VERDICT r15 next-round #1 prescribed.
    names = list(entry.queries())
    head = set(names[:50])
    for n in (
        "snapshot_tighten_read",
        "snapshot_entries_meta",
        "snapshot_cherrypick_read",
        "snapshot_ts_prune_read",
    ):
        assert n in head, n
    for n in (
        "snapshot_schema_history",
        "text_dup_ngram_fraction",
        "funnel_conversion",
        "q_recursive_hierarchy",
        "snapshot_date_prune_read",
    ):
        assert n not in head, n
    # the date twin is still registered and oracle-backed below the line
    assert "snapshot_date_prune_read" in names
    assert "snapshot_date_prune_read" in entry.oracle_sql()


def test_window_queries_nonempty_driver_sf(spark):
    # VERDICT r14 next-round #1: every driver-window query must return
    # rows at the DRIVER's sf0.01 (sf0.001 is enforced by the non-empty
    # guard in tests/oracle.py through test_queries_oracle) — a window
    # slot whose predicate misses the fixture passes the hash compare
    # vacuously and verifies nothing. SF-relative predicates are the
    # cure; this test is the tripwire that a future absolute predicate
    # cannot get past.
    sf01 = "/root/testdata/sf0.01"
    empty = []
    for name in list(entry.queries())[:50]:
        from philotes_spark import registry

        df = registry.QUERIES[name](spark, sf01)
        if not df.take(1):
            empty.append(name)
    assert empty == [], f"vacuous at driver SF: {empty}"


def test_driver_window_fully_oracle_backed():
    # VERDICT r03 #1: every one of the driver's 50 slots must carry a full
    # rows+schema+hash oracle check; rows-only tiers (HLL/CMS sketches,
    # LSH/IVF ANN — quality-gated in pytest instead) sit below the window.
    head = list(entry.queries())[:50]
    osql = entry.oracle_sql()
    missing = [n for n in head if n not in osql]
    assert missing == [], missing


def test_tpch_extras_last():
    # q9_product_profit is deliberately promoted INTO the window (r03): the
    # round-1 wrong-answer fix must be driver-verified; all other TPC-H
    # shapes stay behind every non-TPC-H query.
    names = list(entry.queries())
    assert names.index("q9_product_profit") < 50
    tpch = [
        i
        for i, n in enumerate(names)
        if re.match(r"^q\d+_", n) and n != "q9_product_profit"
    ]
    non_tpch = [i for i, n in enumerate(names) if not re.match(r"^q\d+_", n)]
    assert min(tpch) > max(non_tpch)


def test_oracle_keys_subset_and_ordered():
    qs, osql = list(entry.queries()), list(entry.oracle_sql())
    assert set(osql) <= set(qs)
    positions = [qs.index(n) for n in osql]
    assert positions == sorted(positions)
