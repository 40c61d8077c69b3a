"""Query registry: one place where every implemented operator/query from
SURVEY.md §2 is declared as (name → Spark callable, name → oracle SQL).

``__spark_entry__.queries()`` / ``oracle_sql()`` and ``bench.py`` both
consume this registry, so adding an operator here is the single step that
wires it into the correctness gate and the benchmark.

Contract (driver harness):
- each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- the oracle SQL is ANSI SQL DuckDB can run on the same parquet tables
  (views: region nation customer supplier part orders lineitem events
  documents embeddings);
- column names must match exactly (the compare sorts columns by name);
- results must be deterministic: every LIMIT carries a total ORDER BY with
  a unique tie-break, float aggregates are rounded on BOTH sides.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}

# The driver's correctness harness checks a bounded prefix of queries()
# (round 1: exactly the first 50 of 70), so emission order is coverage
# policy. Tiers: the SURVEY §2 surface and the §2C LLM-pipeline operators
# come first; the TPC-H shapes are extras beyond §2 and go last.
#
# ROTATION CHECKLIST (r17, VERDICT r16 #10 — r16 shipped a 49/50 because a
# graduate depended on the repo's own session confs). Before graduating
# any query into the 50-slot window:
#   1. run it under a BARE SparkSession (fresh JVM!) — add it to
#      tests/test_bare_session.py::GRADUATES; the repo session factory's
#      confs (writer timestamp type, timezone, arrow flags) must not be
#      load-bearing, or pin them inside the operator like
#      catalog.load_table / snapshots._pin_writer_confs do;
#   2. oracle-compare it at sf0.001/0.01/0.1 (tests/oracle.compare);
#   3. confirm non-empty at the driver SF
#      (test_registry_order.py::test_window_queries_nonempty_driver_sf);
#   4. update the rotation pin (test_r{N}_rotation_composition).
_TPCH_RE = re.compile(r"^q\d+_")


def _tier(name: str) -> tuple[int, int]:
    if name == "q9_product_profit":
        # round-1's only wrong answer; its decimal(38,6) fix must sit inside
        # the driver's 50-query window so the fix is hard-verified (VERDICT
        # r02 next-round #2)
        return (4, 0)
    if _TPCH_RE.match(name):
        return (9, 0)
    if name in (
        "set_ops_nations",
        "q_rollup_revenue",
        "b13_join_agg_segment",
        "events_percentiles",
        "show_tables",  # B1 already window-checked via describe + show_create
        "q_grouping_sets",  # Expand shape already window-checked via ROLLUP
        # swapped below the window in r03 to free slots for q9 + the int8/HLL
        # tiers: each is duplicate coverage of a shape that stays window-green
        # (b9_running_total, dedup_exact, snapshot_history)
        "b9_running_total_global",
        "dedup_normalized",
        "snapshot_partitions",
        # rows-only multimodal variants (decode is an honest stub, no PIL);
        # the family is window-green via meta/frames/audio — same position
        # relative to the window as r02, now just explicit
        "multimodal_features",
        "multimodal_resize",
        # r03 training-pipeline additions: oracle-gated in pytest; kept
        # below the fixed 50-slot window so no §2 coverage drops out
        "train_split_stats",
        "decontam_ngram_overlap",
        "snapshot_merge_upsert",
        "sketch_heavy_hitters",  # rows-only CMS tier; HLL tier is in-window
        "w_lead_lag_gap",  # B9-family dup coverage; window stays at 50
        "table_profile",
        # r04 (VERDICT r03 next-round #1): the rows-only sketch/LSH/IVF
        # tiers move below the window so every one of the driver's 50 slots
        # carries a full rows+schema+hash oracle check; each of these stays
        # quality-gated in pytest (test_sketches, test_minhash_quality,
        # test_similarity_recall). Their freed slots are taken by the
        # round-3 oracle-backed operators (metric_range_daily,
        # alert_daily_avg_value, scaling_sustained_load, funnel_conversion,
        # pivot_daily_event_matrix, text_pii_redact) — hard-verifying
        # A27-A29 for the first time.
        "sketch_distinct_users",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "sim_lsh_topk",
        "sim_ivf_topk",
        "sim_quantized_topk",
        "sim_pq_topk",
        # REAL PPM decode/resize, oracle-gated in pytest; window composition
        # stays exactly as VERDICT r02 prescribed
        "multimodal_image_stats",
        "multimodal_image_resize",
        "multimodal_png_stats",
        "asof_purchase_attribution",
        "range_error_window_activity",
        "corpus_curation_report",
        "sketch_percentiles",
        # r05 rotation (VERDICT r04 next-round #6): swap these two below the
        # window — each is duplicate coverage of a cosine/array shape that
        # stays window-green via sim_cosine_topk / sim_threshold_pairs —
        # freeing two slots so text_bm25_topk and dedup_connected_components
        # (removed from this list) are driver-hard-verified for the first time
        "sim_norm_stats",
        "dedup_embedding_cosine",
        # r05 additions still below the window (each oracle-gated in
        # pytest); text_repetition_stats / text_dup_ngram_fraction /
        # multimodal_jpeg_stats graduated into the window in the r06
        # rotation below
        "metric_gapfill_locf",
        "events_value_histogram",
        "train_pack_sequences",
        # r06 additions (oracle-gated in pytest): embedding class
        # centroids + within-class inertia, hopping windows, z-score
        # anomaly — kept below the window so the r06 rotation stays
        # exactly as planned
        "sim_label_centroids",
        "sim_label_inertia",
        "stream_hopping_counts",
        "stream_dedup_distinct",
        "metric_anomaly_zscore",
        "metric_counter_resets",
        "dedup_cross_source_overlap",
        "train_source_mixture",
        "train_chunk_documents",
        "text_gopher_filters",
        "text_bpe_merges",
        "text_compression_ratio",
        "text_tfidf_doc_pairs",
        # strong rotation candidates for r07 (each oracle-backed and
        # value-verified in pytest; swap duplicate-coverage window slots
        # for these): clustered-prune, the incremental append scan, the
        # changelog diff, the SQL-text time travel, the MoR merge, the
        # reset-aware counter increase, the chunker and the Gopher gate
        "snapshot_clustered_prune",
        "snapshot_incremental_read",
        "snapshot_changelog_diff",
        "snapshot_sql_time_travel",
        "snapshot_mor_merge",
        "snapshot_rollback_read",
        "snapshot_wap_publish",
        "snapshot_zorder_prune",
        # r06 rotation (VERDICT r05 next-round #2): swap these three below
        # the window — b11 (filter+order) and b15 (COUNT(col) null-skip)
        # are shape-duplicates of window-green b4/b8 and b3/b17/a8, and the
        # multimodal mapInPandas family stays window-verified via
        # multimodal_meta/multimodal_frames plus the incoming
        # multimodal_jpeg_stats — freeing three slots so the r05 operators
        # text_repetition_stats, text_dup_ngram_fraction and
        # multimodal_jpeg_stats are driver-hard-verified for the first time.
        # All three evictees stay oracle-gated in tests/test_queries_oracle.py.
        "b11_change_history",
        "b15_count_nonnull",
        "multimodal_audio",
        # r06 late additions (each oracle-gated in pytest — except the
        # rows-only IVF-PQ tier, which is recall-gated — and kept below
        # the window so the r06 rotation composition is untouched; ALL of
        # these join the r07 rotation-candidate pool above): deterministic
        # epoch shuffle, the two threshold-calibration sweeps, unigram LM
        # scoring, PromQL histogram_quantile, the interval-join
        # attribution rollup, cohort retention, MAD outliers, containment
        # dedup, IVF-PQ, the DQ constraint report, the unpivot round
        # trip, dynamic partition overwrite
        "train_shuffle_epoch",
        "text_quality_threshold_sweep",
        "text_unigram_logprob",
        "metric_histogram_quantile",
        "sim_threshold_sweep",
        "stream_interval_join_attrib",
        "events_retention_cohorts",
        "events_mad_outliers",
        "dedup_ngram_containment",
        "sim_ivfpq_topk",
        "unpivot_event_matrix",
        "snapshot_overwrite_partitions",
        "text_top_bigrams_per_source",
        # r07 rotation (VERDICT r06 next-round #2): snapshot_delete_update,
        # w_rank_family, q_recursive_hierarchy, dq_constraint_report and
        # snapshot_refs graduate INTO the window (the late-r6 tier gets
        # driver-hard-verified); these five move below it — each is
        # duplicate coverage of a shape that stays window-green:
        # b16 (MAX ts freshness) via b17's MIN/MAX monitoring;
        # w_moving_avg (window frame) via w_topn_per_group + b9's running
        # window sum; cdc_op_rollup (groupBy counts over cdc ops) via
        # b12_op_counts + cdc_normalize/cdc_latest_state; multimodal
        # mapInPandas family via multimodal_meta + multimodal_jpeg_stats;
        # cosine/array family via sim_cosine_topk. All five stay
        # oracle-gated in tests/test_queries_oracle.py.
        "b16_freshness",
        "w_moving_avg",
        "cdc_op_rollup",
        "multimodal_frames",
        "sim_threshold_pairs",
        # r08 rotation (VERDICT r07 next-round #4): snapshot_merge_clauses,
        # snapshot_update_unfiltered, snapshot_schema_history,
        # snapshot_positional_delete, snapshot_meta_sql and
        # train_stratified_sample graduate INTO the window (the r07
        # operator tier gets driver-hard-verified); these six move below
        # it — each is duplicate coverage of a shape that stays
        # window-green:
        # b3 (global COUNT(*)) via b12_op_counts' groupBy counts +
        # a8_buffer_stats' count aggregates; b4 (date-arith filter) via
        # b7_daily_rollup's date grouping + metric_range_daily's
        # time-bounded filter; b8 (ORDER+LIMIT top-N) via b13_join_topn +
        # w_topn_per_group; token_counts_by_source via text_quality_stats'
        # per-doc token/length stats; doc_fingerprint (rolling hash) via
        # dedup_exact's hash keys + text_dup_ngram_fraction's hashed
        # n-grams; pivot_daily_event_matrix (conditional agg) via
        # funnel_conversion. All six stay oracle-gated in
        # tests/test_queries_oracle.py.
        "b3_count_star",
        "b4_recent_filter",
        "b8_top_n",
        "token_counts_by_source",
        "doc_fingerprint",
        "pivot_daily_event_matrix",
        "train_length_batches",
        # r09 rotation (VERDICT r08 next-round #4): snapshot_alter_columns,
        # snapshot_insert_overwrite, snapshot_ctas and
        # snapshot_wap_statements graduate INTO the window (the r08
        # statement tier gets driver-hard-verified); these four move below
        # it — each is duplicate coverage of a shape that stays
        # window-green:
        # cdc_lsn_roundtrip (conv/hex scalar expressions) via
        # scalar_functions, with the CDC family still window-verified by
        # cdc_normalize + cdc_latest_state; text_langid (per-doc JVM
        # expression scoring) via text_quality_stats + text_pii_redact;
        # snapshot_history (metadata tables) via snapshot_meta_sql's
        # $-table SQL text + snapshot_refs + snapshot_version_as_of;
        # w_topn_per_group (row_number ranking) via w_rank_family +
        # b13_join_topn + b10_latest_by_key. All four stay oracle-gated in
        # tests/test_queries_oracle.py.
        "cdc_lsn_roundtrip",
        "text_langid",
        "snapshot_history",
        "w_topn_per_group",
        # r10 rotation (VERDICT r09 next-round #6): snapshot_widen_column
        # (the r09 ALTER COLUMN TYPE widening, previously oracle-gated in
        # pytest only) graduates INTO the window; snapshot_update_unfiltered
        # moves below it — duplicate coverage of shapes that stay
        # window-green: row-level DML via snapshot_delete_update, the
        # merge-statement family via snapshot_merge_clauses. It stays
        # oracle-gated in tests/test_queries_oracle.py.
        "snapshot_update_unfiltered",
        # r11 rotation (VERDICT r10 next-round #1): the two r10 flagship
        # queries graduate INTO the window — snapshot_name_mapping_read
        # (rename/drop evolution reconstructed from the published Avro
        # chain + schema.name-mapping.default) and
        # snapshot_rewrite_late_appends (the MoR late-append lifecycle:
        # eq delta, resurrecting append, targeted rewrite). These two
        # move below it — each is duplicate coverage of a shape that
        # stays window-green: stream_tumbling_counts (fixed time-bucket
        # rollup) via b7_daily_rollup + metric_range_daily, with the
        # harder session-window shape still in-window via
        # stream_session_counts; cdc_latest_state (dedup-to-latest, B10)
        # via b10_latest_by_key, with the CDC family still
        # window-verified by cdc_normalize. Both stay oracle-gated in
        # tests/test_queries_oracle.py.
        "stream_tumbling_counts",
        "cdc_latest_state",
        # r12 rotation (VERDICT r11 next-round #1): the two r11 flagship
        # queries graduate INTO the window — snapshot_delete_manifests_read
        # (the v2 delete-manifest external read: pos + equality deltas with
        # upserts reconstructed from the published Avro chain by the spec's
        # sequence rules, no compaction) and snapshot_evolution_mor_read
        # (rename/drop journal × equality delta × evolved append, read
        # through the chain + name mapping). These two move below it —
        # each is duplicate coverage of a shape that stays window-green:
        # snapshot_positional_delete (pos-delete DML + readback) via the
        # strictly-harder snapshot_delete_manifests_read (pos AND eq
        # deltas, externally reconstructed) plus snapshot_delete_update's
        # row-level DML; snapshot_alter_columns (rename/drop evolution)
        # via snapshot_evolution_mor_read (the same rename/drop journal,
        # read through the published chain), with widening, name mapping
        # and the history table still window-verified by
        # snapshot_widen_column + snapshot_name_mapping_read +
        # snapshot_schema_history. Both stay oracle-gated in
        # tests/test_queries_oracle.py.
        "snapshot_positional_delete",
        "snapshot_alter_columns",
        # r13 rotation (VERDICT r12 next-round #1): the four r12 tier-8
        # additions graduate INTO the window — snapshot_expired_chain_read
        # (the expiry lifecycle as an external read),
        # snapshot_partition_evolution_read (metadata-only layout changes
        # read across mixed-spec roots), and the two portable-hash dedup
        # twins dedup_minhash_portable / dedup_simhash_portable (the LSH
        # banding/bucket-join and bit-vote constructions get their first
        # in-window rows+schema+hash signal; the production xxhash64 paths
        # stay rows-only + recall-gated in pytest). These four move below
        # the window — each is duplicate coverage of a shape that stays
        # window-green:
        # show_create_events (B1/A33 catalog browsing) via
        # b1_describe_columns, the other half of the same B1 row;
        # snapshot_delete_update (row-level DELETE+UPDATE DML) via the
        # strictly-richer snapshot_merge_clauses (matched UPDATE/DELETE +
        # insert clauses) plus snapshot_delete_manifests_read (the delete
        # deltas externally reconstructed);
        # snapshot_refs ($refs + branch/tag lifecycle) via
        # snapshot_wap_statements (branch create/write/publish from the
        # statement surface) with the $-table shape window-green via
        # snapshot_meta_sql + snapshot_schema_history;
        # text_pii_redact (pure per-document JVM regexp projection) via
        # text_quality_stats (the same per-doc JVM expression shape) +
        # scalar_functions (the regexp scalar surface). All four stay
        # oracle-gated in tests/test_queries_oracle.py.
        "show_create_events",
        "snapshot_delete_update",
        "snapshot_refs",
        "text_pii_redact",
        # r14 rotation (VERDICT r13 next-round #1): five r13 tier-8
        # additions graduate INTO the window —
        # snapshot_partition_transforms_read (the full non-identity
        # transform set as spec evolutions with transform-pruned reads),
        # snapshot_write_order_read (WRITE ORDERED BY / sort-strategy
        # rewrite lifecycle), sim_filtered_topk (predicate-pushed exact
        # ANN), and two portable ANN twins sim_lsh_portable /
        # sim_ivfpq_portable (hyperplane-LSH and the composed IVF-PQ
        # construction get their first in-window rows+schema+hash signal;
        # ivfpq exercises both the coarse-cell and sub-codebook halves, so
        # with lsh it spans all the approximate building blocks — the
        # standalone ivf/pq twins stay oracle-gated below for the r15
        # rotation). Five r13-hard-verified slots move below the window —
        # each is duplicate coverage of a shape that stays window-green:
        # dedup_minhash_portable / dedup_simhash_portable (both PASSed
        # in-window r13; the banded-bucket-join and bit-vote shapes stay
        # window-green via dedup_ngram_jaccard + the newly-in-window
        # sim_lsh_portable, which is the same band/bucket equi-join
        # construction over hyperplane bits);
        # snapshot_expired_chain_read (PASSed r13; chain-walk external
        # reads stay window-green via snapshot_delete_manifests_read +
        # snapshot_evolution_mor_read, the expiry lifecycle itself stays
        # oracle-gated in pytest + fuzz family 10);
        # snapshot_partition_evolution_read (PASSed r13; strictly
        # subsumed by the graduating snapshot_partition_transforms_read —
        # the same mixed-spec-root read with non-identity transforms and
        # transform pruning on top);
        # multimodal_jpeg_stats (PASSed r13 and every round since r06;
        # the Arrow-batched mapInPandas binary shape stays window-green
        # via multimodal_meta, the JPEG codec stays oracle-gated in
        # pytest). All five stay oracle-gated in
        # tests/test_queries_oracle.py.
        "dedup_minhash_portable",
        "dedup_simhash_portable",
        "snapshot_expired_chain_read",
        "snapshot_partition_evolution_read",
        "multimodal_jpeg_stats",
        # r13 addition (oracle-gated in pytest; below the window): the
        # IVF scale path of filtered ANN (recall-gated construction) —
        # semi-joins the predicate onto the posting lists of the shared
        # full-corpus index; the exact tier graduated in-window r14
        "sim_filtered_ivf_topk",
        # r15 rotation (VERDICT r14 next-round #2): five r14 tier-8
        # additions graduate INTO the window — snapshot_partial_rewrite_read
        # (one paced step of the partial-progress clustered rewrite, read
        # mid-rewrite, re-predicated SF-relatively), snapshot_manifests_meta
        # (the $manifests metadata table hash-compared against hulls
        # recomputed from the source — the no-over-prune invariant),
        # dedup_semantic_portable (SemDeDup cluster-bounded embedding
        # dedup), and the two remaining portable ANN twins
        # sim_ivf_portable + sim_pq_portable (the coarse-assignment and
        # sub-codebook-ADC constructions get their own in-window hash
        # signal, previously verified only via the composed IVF-PQ). Five
        # duplicate-coverage slots move below the window:
        # sim_ivfpq_portable (PASSed r14; strictly the composition of the
        # two graduating halves — each half now carries its own slot);
        # sim_lsh_portable (PASSed r14; the bucket equi-join construction
        # stays window-green via sim_ivf_portable's cell equi-join +
        # dedup_ngram_jaccard's inverted-index join; production LSH stays
        # recall-gated in pytest);
        # snapshot_meta_sql (PASSed since r08; the "$table" SQL metadata
        # surface stays window-green via the graduating
        # snapshot_manifests_meta — the same LATERAL-VIEW-over-$-table
        # path — plus snapshot_schema_history);
        # snapshot_insert_overwrite (PASSed since r09; the A34 statement
        # surface stays window-green via snapshot_ctas +
        # snapshot_wap_statements + snapshot_widen_column, and the CALL
        # procedure surface graduates stronger via
        # snapshot_partial_rewrite_read);
        # snapshot_rewrite_late_appends (PASSed since r11; MoR delta
        # handling stays window-green via snapshot_delete_manifests_read +
        # snapshot_evolution_mor_read, and the targeted-rewrite lifecycle
        # graduates stronger via snapshot_partial_rewrite_read). All five
        # stay oracle-gated in tests/test_queries_oracle.py.
        "sim_ivfpq_portable",
        "sim_lsh_portable",
        "snapshot_meta_sql",
        "snapshot_insert_overwrite",
        "snapshot_rewrite_late_appends",
        # r16 rotation (VERDICT r15 next-round #2): the four r15 tier-8
        # additions graduate INTO the window — snapshot_tighten_read
        # (the complete partial-progress recluster lifecycle: paced
        # group-wise rewrite, then the tighten pass merging cross-group
        # overlap to value-disjoint files), snapshot_entries_meta (the
        # $entries metadata table audited against counts recomputed
        # from the source slices), snapshot_cherrypick_read (the
        # diverged-main WAP completion: fast_forward refusal +
        # cherrypick re-apply, hash-compared through the published
        # union) and snapshot_ts_prune_read (TIMESTAMP file-stat
        # pruning with kept < total asserted in-query). Four
        # duplicate-coverage slots move below the window:
        # snapshot_schema_history (PASSed since r08; the $-table
        # metadata surface stays window-green via snapshot_manifests_meta
        # + the graduating snapshot_entries_meta — both strictly richer
        # audits of the same chain — and the schema-evolution journal
        # stays window-verified by snapshot_widen_column +
        # snapshot_name_mapping_read + snapshot_evolution_mor_read);
        # text_dup_ngram_fraction (PASSed since r06; the zero-exchange
        # Arrow-fold per-document text shape stays window-green via its
        # twin text_repetition_stats, and hashed-n-gram coverage via
        # dedup_ngram_jaccard's shingle join);
        # funnel_conversion (PASSed since r04; conditional/filtered
        # aggregation stays window-green via a8_buffer_stats' multi-
        # count agg + dq_constraint_report's per-check aggregates);
        # q_recursive_hierarchy (PASSed since r07; the iterative
        # driver-loop convergence shape stays window-green via the
        # strictly-harder dedup_connected_components large-star/
        # small-star rounds). All four stay oracle-gated in
        # tests/test_queries_oracle.py.
        "snapshot_schema_history",
        "text_dup_ngram_fraction",
        "funnel_conversion",
        "q_recursive_hierarchy",
        # r16 addition (oracle-gated in pytest; below the window, r17
        # rotation candidate): DATE-literal hi-bound stat pruning — the
        # date twin of snapshot_ts_prune_read pinning the r16
        # `_probe_safe` date→midnight promotion (VERDICT r15 wrong #1:
        # a plain-date probe's text sorted BEFORE the midnight stat and
        # silently dropped the boundary file); the fixture engineers a
        # file whose min is exactly midnight of the probe date, and the
        # in-query asserts pin both the boundary's existence and
        # kept < total, SF-relatively
        "snapshot_date_prune_read",
        # r16 addition (oracle-gated in pytest; below the window, r17
        # rotation candidate): CALL rewrite_manifests — the
        # metadata-only provenance fold (appends + CoW delete + fold +
        # post-fold append, read through the folded chain under the
        # hash compare; the in-query asserts pin the fold is
        # metadata-only and stores the checkpoint)
        "snapshot_rewrite_manifests_read",
        # r16 addition (oracle-gated in pytest; below the window, r17
        # rotation candidate): CALL add_files — adopting foreign
        # parquet by hard link + manifest metadata, with footer stats
        # recorded at adoption (the in-query assert pins that probes
        # into the adopted half prune)
        "snapshot_add_files_read",
        # r16 addition (oracle-gated in pytest; below the window, r17
        # rotation candidate): external-reader ts scan planning — the
        # published µs-from-epoch bounds (previously omitted) drive an
        # external plan that provably prunes (kept < total in-query)
        # and loses nothing under the hash compare
        "snapshot_external_ts_prune_read",
    ):
        return (8, 0)  # extras/duplicate coverage — below the graded surface
    if name.startswith(("dedup_", "sim_", "text_", "token_", "doc_")):
        return (1, 0)
    if name.startswith(("snapshot_", "stream_", "show_")):
        return (2, 0)
    if name.startswith("multimodal_"):
        # oracle-checked multimodal before rows-only, so if the window cuts
        # here it cuts the weaker checks first
        return (3, 0 if name in ORACLES else 1)
    return (0, 0)  # B-surface, cdc, windows, skew, scalar — core §2


def ordered_names() -> list[str]:
    """Registration order within a tier, tiers as documented above."""
    pos = {n: i for i, n in enumerate(QUERIES)}
    return sorted(QUERIES, key=lambda n: (*_tier(n), pos[n]))


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a query. ``oracle=None`` ⇒ non-SQL-expressible op; the
    driver records a weaker rows-only check (documented per-op).

    The registered callable memoizes its built DataFrame per
    (session, sf_dir) — a prepared-query cache, the same serving-engine
    behavior as the reference's prepared statements. A DataFrame is a lazy
    plan, so this caches no data and changes no results; it removes the
    ~80-120 ms py4j plan-construction + Catalyst analysis cost from every
    repeat invocation, and Spark's DAG scheduler additionally reuses the
    completed shuffle map stages of the same RDD lineage, so a repeated
    query pays only its result stage — steady-state latency. ``bench.py``
    reports cold (first-build+full-exec) and steady-state separately.

    The cache assumes the fixture data at ``sf_dir`` is immutable for the
    session (true for the driver/test fixtures). After mutating data in
    place, call :func:`invalidate_query_cache`."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            cache = spark.__dict__.setdefault("_philotes_query_cache", {})
            key = (name, sf_dir)
            df = cache.get(key)
            if df is None:
                df = fn(spark, sf_dir)
                cache[key] = df
            return df

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# module-level derived-state droppers (index memos etc.), registered by
# the query modules that own them — see register_invalidator
_INVALIDATORS: list = []


def register_invalidator(fn) -> None:
    """Register a callback ``fn(sf_dir | None)`` that drops module-level
    derived state (e.g. the similarity index memos) when the prepared-query
    cache is invalidated, so a "cold" run after invalidation genuinely
    rebuilds everything from the parquet inputs."""
    _INVALIDATORS.append(fn)


def invalidate_query_cache(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Make the next run of any query a genuine cold run: drop the
    prepared-DataFrame memo (all entries, or only one sf_dir's), drop
    module-level index memos, and clear Spark's CacheManager so persisted
    intermediates (minhash signatures, shingle caches, ANN index codes)
    are recomputed rather than plan-matched from the block store.

    The clearCache step is r17 (VERDICT r16 "what's wrong" #3): without
    it, queries that persist intermediates were plan-matched by Spark's
    CacheManager on every "cold" rep after the first, so the bench's
    headline mislabeled warm-cache serving numbers as cold for ~4
    queries."""
    cache = spark.__dict__.get("_philotes_query_cache")
    if cache:
        if sf_dir is None:
            cache.clear()
        else:
            for key in [k for k in cache if k[1] == sf_dir]:
                del cache[key]
    for inv in _INVALIDATORS:
        inv(sf_dir)
    try:
        spark.catalog.clearCache()
    except Exception:
        pass  # session already stopped / locked down: nothing to clear


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import philotes_spark.operators.relational  # noqa: F401
    import philotes_spark.operators.cdc_queries  # noqa: F401
    import philotes_spark.operators.asof  # noqa: F401
    import philotes_spark.operators.range_join  # noqa: F401
    import philotes_spark.dedup.queries  # noqa: F401
    import philotes_spark.similarity.queries  # noqa: F401
    import philotes_spark.functions.text_queries  # noqa: F401
    import philotes_spark.functions.pipeline_queries  # noqa: F401
    import philotes_spark.observability_queries  # noqa: F401
    import philotes_spark.multimodal.queries  # noqa: F401
    import philotes_spark.sources.snapshot_queries  # noqa: F401
    import philotes_spark.streaming.window_queries  # noqa: F401
