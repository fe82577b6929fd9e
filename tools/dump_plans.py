"""Regenerate PLANS.md: finalized physical plans of the headline queries
with the scale-relevant properties annotated. Run:

    python tools/dump_plans.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

NOTES = {
    "q1_pricing_summary": "one exchange; filter pushed to parquet; map-side partial aggregation",
    "q5_nation_revenue": "all five dims broadcast — the fact table never shuffles for the joins",
    "dedup_exact_parts": "min_by hash aggregate (partial_min_by before the exchange), no window sort",
    "fuzzy_pairs_blocked_parts": "hash equi-join on the blocking key — no CartesianProduct/BNL node",
    "minhash_candidates_docs": "signatures map-only; band join shuffles (id, band, bucket) only",
    "knn_bruteforce": "query side broadcast; big vector side scans in place",
    "asof_purchases_to_errors": "union + single window — no join node at all",
    "events_sessionize": "one shuffle (partition by user), window sort within partitions",
    "q6_forecast_revenue": "all three predicates pushed to the parquet scan; 4-column ReadSchema",
    "events_funnel": "three stage windows + user rollup share ONE exchange; no self-joins",
    "decontaminate_against_src0": "held-out gram set distinct-reduced then broadcast; corpus side semi-joins in place",
    "pack_training_sequences": "chunking map-only; one exchange on the stream key for cumsum + rollup",
    "q4_order_priority_exists": "EXISTS decorrelated to one left-semi hash join; lateness is a join residual",
    "q21_late_sole_suppliers": "EXISTS/NOT EXISTS as one semi + one anti join, equi-keyed on the order key",
    "q2_min_cost_supplier": "correlated scalar-min as aggregate + equi-join; dim chains broadcast",
    "q11_important_part_values": "region semi-join broadcast; scalar (total,count) is a 1-row broadcast; AQE reuses the per-part agg exchange",
    "q16_supplier_part_counts": "NOT IN as broadcast left-anti; two-level distinct-count aggregate",
    "q20_heavy_shippers": "agg-threshold subquery as two hash aggregates equi-joined on the part key",
    "winnow_near_dup_docs": "hash stream repartitioned across cores, checkpointed once; posting-list equi-join, df-capped buckets",
    "jaccard_near_dup_docs": "inverted-index candidates + rare-first prefix filter; exact verify join — no BNL/Cartesian",
    "pii_redaction_report": "regex scan/redact map-only; single aggregation exchange",
    "strip_boilerplate_docs": "chunking map-only; fingerprint-count shuffle is 16-byte keys; boilerplate set broadcasts for the anti-join; one reassembly shuffle keyed by doc",
    "pq_knn_embeddings": "codebook + per-query lookup table broadcast; only code ints and partial sums shuffle — float vectors never read at search time",
    "pretoken_budget_by_segment": "regex pre-tokenizer map-only; single aggregation exchange",
    "hll_distinct_rollup": "per-group sketch partials merge map-side; union rollup reads sketches, not raw data",
    "train_val_test_split_docs": "split assignment is a pure projection (zero shuffle); one aggregation exchange",
    "doc_tfidf_top_terms": "term dictionary broadcast onto per-doc tf counts; top-k window only on the id slice",
    "doc_dup_span_fraction": "r15 reshape: per-doc totals are pure arithmetic (no explode); ONE gram explode onto ONE gram-keyed exchange that both the (gram, doc) aggregate and the df window ride; doc-keyed reduction — no semi-join, no BNL/Cartesian",
    "pivot_year_flag_revenue": "explicit pivot values — no discovery job; one data-sized exchange, pivotfirst re-shuffles grouped rows only",
    "price_quantity_stats": "exact decimal power sums in one aggregation pass; closed-form corr on the 3-row result",
    "remove_dup_spans_docs": "grams + tokens map-only; dup grams semi-join, covered positions anti-join; one reassembly shuffle keyed by doc — no BNL/Cartesian",
    "bpe_first_merge_pairs": "join-free: pretoken explode → (word) hash agg → pair explode → (pair) hash agg → top-k; map-side partials throughout",
    "corpus_mixture_waterfill": "corpus aggregated once into an eager checkpoint; all 4 water-filling rounds iterate over the n_sources-row materialized relation (zero parquet scans in the query plan)",
    "url_canonical_customers": "pure projection: regex/string kernels map-only, no exchange, no join",
    "doc_hashed_quality_score": "join-free model inference: explode + one hash aggregate with map-side partials; weights live in the expression",
    "doc_trained_quality_score": "trainer is two hash aggregates ((doc,bucket) counts → per-bucket statistics); the ≤256-row weight table broadcasts back for inference — corpus never shuffles for the model join",
    "corpus_mixture_execute": "waterfill plan iterates the checkpointed n_sources relation; budgets broadcast; one exchange on source for the running-sum window — no global sort",
    "cross_source_dup_matrix": "blank-doc filter + chunking map-only; distinct + self-join move (16-byte md5, source) pairs only — text never shuffles",
    "curation_pipeline_docs": "five stages, shuffle-disciplined end to end: trainer aggregations → broadcast weight join → fingerprint window → per-source cap window → projection split; no SortMergeJoin, no cartesian",
    "weighted_jaccard_near_dup_docs": "ICWS signatures map-only (one JVM hash per gram, Arrow argmin kernel); band join shuffles (id, band, bucket) only; multiset verify joins back by id for survivors",
    "token_quantile_sketch_docs": "one group-key shuffle for the bottom-k window; estimation runs on the k·|groups|-bounded sketch — raw data read once",
    "vocab_growth_report": "integer id-range deciles from two broadcast scalars (no global ntile window); gram → first-decile hash aggregate with map-side partials; 10-row running sum",
    "coreset_sample_embeddings": "centroid literals live in the plan (no join); assignment + cosine scoring row-local; only slim (id, cell, score) rows shuffle for the rank window",
    "hard_negative_mining_embeddings": "bounded (id, vector, label) query set broadcast; corpus scans in place; label + dup-ceiling exclusions filter BEFORE the top-k window",
    "fused_dedup_docs": "both edge generators ARE the single-signal queries (one spelling each); the union moves bare id pairs; CC is pointer-doubling over ids",
    "embedding_norm_sketch": "row-local L2 norms; ONE group-key exchange shared by the tag-collapse and rank windows; estimation on the bounded sketch",
    "customer_rfm_segments": "quartile cut-points computed in separate model-state jobs (range-partition rank machinery); the RETURNED plan is the per-customer aggregate + broadcast scalar ref + map-only band CASE — zero Window nodes, no ntile (r10 rework)",
    "lsh_banding_plan_docs": "exact pair set via the inverted-index SSJoin (no BNL); 4-row banding grid broadcast-crossed onto the pair aggregate; probabilities quantized to BIGINT before the sum",
    "dup_threshold_sensitivity_docs": "one inverted-index pass at the lowest rung; pairs explode over cleared rungs then into endpoint ids (no per-rung re-scan), so a SINGLE hash aggregate yields both counts (r11 rework — no checkpoint, construction execution-free); corpus denominator is a 1-row broadcast scalar",
    "gopher_quality_rules_docs": "one map pass builds five booleans per doc; one aggregate sums them; stack unpivots the 1-row result — no shuffle carries text",
    "lsh_banding_plan_sampled_docs": "the 100 TB planner spelling: md5 hash-sample filter rides the scan (map-only, before shingling), then the identical SSJoin + banding-grid aggregate over the f²-thinned pair set; count columns upweight by the exact (1/f)²",
    "dup_threshold_sensitivity_sampled_docs": "sampled twin of the sensitivity dial — same single-aggregate shape over the hash-sampled pair set; unbiased pair estimates, documented _lb doc columns",
    "c4_quality_rules_docs": "lines split ONCE into a staged array column; seven booleans in one map pass, one aggregate, stack unpivot — no shuffle carries text",
    "remove_dup_spans_w50_docs": "identical plan family to remove_dup_spans_docs with the window knob at the published 50 tokens: gram/df shuffle, semi-join, coverage explode, one document-keyed reassembly shuffle",
    "gopher_repetition_signals_docs": "one logical gram stream, column-pruned per branch: the top-(2,3,4) shuffle carries (doc,n,gram,count,chars) only, the dup-(5..10) branch carries positions+lengths in-row (no lengths join); all aggregations doc-keyed, no cross-document edges",
    "dedup_keep_best_quality_docs": "pair set is the inverted-index SSJoin (no BNL); CC is pointer-doubling over bare ids; quality score map-only, joined by doc_id; the only window partitions by component (cluster-bounded, never corpus-wide)",
    "dedup_signal_overlap_report": "three oracle-graded pair generators union bare id pairs; one pair-keyed aggregate builds the combo key; the share window runs on the <=7-row combo aggregate",
    "dedup_signal_overlap_sampled_docs": "the 100 TB spelling: md5 hash-sample predicates ride every leg's scan (map-only, before shingling/banding); identical combo aggregate over the f^2-thinned pair set; flat cost at fixed absolute sample (sf1 exponent -0.01)",
    "incremental_keep_best_quality_docs": "batch postings equi-join the corpus gram index (no batch x corpus cross join, corpus never self-joins); the (quality, lowest-id) winner is one packed-BIGINT max per batch doc; quality map-only",
    "html_text_extraction_docs": "pure projection: synthesis + regexp strip chain + round-trip compare all map-only, whole-stage codegen, zero exchange",
    "warc_ingest_docs": "PARSING is the scale path: split + substring per blob then one explode, map-only; the per-source string_agg is synthesis-fixture machinery (production reads real bounded WARC files as blobs)",
    "web_ingest_pipeline_docs": "the capstone chain: Content-Length position fold (one task per WARC blob) -> pinned keyed respread (r15: the broadcast expected-text join never widens the AQE-coalesced parse, so extraction ran one-core) -> map-only block-classifier extraction -> token-count projection; ONE broadcast join back to the corpus",
    "trained_language_id_char3_report": "same two-hash-agg trainer + broadcast inference as the token entry; the feature stream is a per-row char-trigram transform (map-only) — no extra shuffle anywhere",
    "trained_language_id_report": "training = two hash aggregations over exploded tokens (map-side combinable, no driver state); inference = one (doc,bucket) agg + BROADCAST of the <=1280-row model + broadcast penalty cross; 2^-20 dyadic weight grid keeps scores order-independent; corpus never shuffles for the model",
    "main_content_extraction_docs": "block split + per-block higher-order density/length gates + strip chain, all map-only regexp/HOF projection — zero shuffle, zero join; the page synthesis is fixture machinery (production runs the extractor on WARC-sliced payloads)",
    "warc_binary_ingest_docs": "Content-Length cursor scan as an Arrow pandas_udf per blob (sequential by nature; the native fold spelling measured O(records^2) — see BASELINE sf1 r12) — map-only, one explode, one join back; one blob = one task matches the CommonCrawl per-file layout; adversarial payloads (embedded blank lines / fake version lines / trailing CRLF) round-trip byte-exactly",
    "warc_gzip_ingest_docs": "the .warc.gz layout (r13): member-per-record zlib inflation chained into the octet cursor scan, one task per gzip blob — the exact CommonCrawl on-disk shape; synthesis compression is a scaffolding pandas_udf, the graded path is the parse; oracle derives ground truth without gunzipping",
    "warc_octet_ingest_docs": "the OCTET-space twin (r13): the identical cursor scan over a BinaryType blob, where offset arithmetic is octet arithmetic by construction — multi-byte UTF-8 payloads that would mis-slice under char offsets round-trip byte-exactly; map-only parse, one explode, NO join back (every graded column, incl. the md5-of-payload-bytes gate, comes from the parsed record itself)",
    "http_framed_ingest_docs": "HTTP framing (r14): octet WARC parse -> http_split_message byte-boundary CRLF-CRLF scan -> charset-aware decode -> block-classifier extraction, every stage a map-only Arrow/HOF projection over blob rows; ONE join back for the expected text; a framing error (head bytes leaking into the body) flips body_octets and the article md5",
    "charset_transcode_ingest_docs": "charset transcoding (r14): cp1252 encode (scaffolding) -> decode_web_text resolving the charset from the Content-Type header (even rows) or the <meta> sniff (odd rows) -> extraction; all map-only Arrow/HOF; ONE join back; utf8_surplus_octets > 0 everywhere proves the payload was not UTF-8",
    "warc_file_ingest_docs": "on-disk .warc.gz ingestion (r14): distributed foreachPartition writer (synthesis scaffolding, no driver collect) -> binaryFile source scan -> auto-gzip-sniff inflation -> octet cursor scan; read side is scan->project->explode, map-only, ZERO exchange, one task per file — the CommonCrawl parallelism grain (gzip inflates sequentially; executors saturate on file count)",
    "http_coded_body_ingest_docs": "HTTP codings (r14): per-doc binary record (no per-source groupBy — binary concat_ws doesn't exist and a fold is O(n^2); the multi-record layout is graded elsewhere) -> octet scan -> http split -> chunked reassembly + Content-Encoding gunzip (RFC 9112 order) -> charset decode -> extraction; all map-only Arrow stages, ONE join back",
    "wet_text_ingest_docs": "WET sidecar layout (r14): per-source gzip synthesis groupBy -> member inflation + octet scan -> WARC-Type dispatch filter (conversion only; a dispatch failure breaks the row count) -> decode + token stats; map-only, NO join back — every graded column comes from the conversion record",
    "url_tracking_dedup_docs": "crawl-identity URL dedup (r14): map-only canonicalization (pure regex/array natives, zero UDF) with anchored case-insensitive tracking-param strip -> ONE aggregation exchange on the canonical key — the exact shape of a 100 TB crawl-identity pass",
    "noindex_filter_docs": "robots noindex drop (r14): map-only native-regex classification (RE2-safe two-alternative pattern, identical in both engines) -> ONE aggregation exchange; decoy meta + negative controls prove the name gate",
    "warc_digest_dedup_docs": "digest-header dedup (r14): parse + header-only projection (payload bytes never leave the record struct) -> ONE aggregation exchange on WARC-Payload-Digest — at 100 TB the difference between a header shuffle and a full-text pipeline",
    "crawl_recipe_ingest_docs": "the batch CommonCrawl recipe graded whole (r15): binaryFile scan -> octet cursor parse -> digest-dedup window on an input-bytes-sized keyed repartition (the decode chain must not run on an AQE-coalesced single partition) -> HTTP framing/coding/charset decode (map-only Arrow) -> noindex gate -> extraction -> canonical-identity collapse (same pinned width) -> curated docs checkpointed ONCE before the fan-out (r15: the chain re-executed 3x) -> banded MinHash (bands=32) -> CC -> quality-ranked survivorship window",
    "warc_corrupt_audit_docs": "loss accounting (r15): distributed fixture writer plants truncated/corrupt gzip members + malformed/over-declared records; the REPORT path is binaryFile scan -> ONE Arrow accounting kernel per file (shared inflate/scan helpers with the plain reader — counts cannot drift), map-only, ZERO exchange; graded values assert recovered rows AND reported loss (no-silent-caps)",
    "wat_metadata_ingest_docs": "WAT sidecar (r15): binaryFile scan -> octet parse -> WARC-Type dispatch BEFORE the JSON parse (non-metadata records cost a header regex) -> PERMISSIVE from_json envelope projection (title/outlinks/headers); map-only, zero exchange, one task per file; tolerant WARC-Date parse (short fraction + lowercase z) graded in passing",
    "redirect_identity_ingest_docs": "redirect-aware identity (r15): 3xx Location edges harvested from framed heads BEFORE the status gate discards them; identity = canonical URL resolved through redirect_hops keyed equi-joins (AQE broadcasts the edge side when small); doc-id-salted articles make shingle sets pairwise disjoint, so the near-dup stage provably contributes nothing — the graded collapse is the redirect mechanism alone",
    "url_blocklist_filter_docs": "domain-blocklist gate (r15): map-only registrable_domain extraction -> BROADCAST left join against the KB-sized blocklist (zero shuffle for membership) -> ONE aggregation exchange; exact-registrable match, never substring",
    "wat_link_graph_docs": "outlink graph (r15): native sequence/transform synthesis + one map-side explode -> registrable-domain projection -> intra-domain filter -> ONE aggregation exchange on dst domain; fan-out bounded by links-per-page — the 100 TB anchor-text shape",
    "paragraph_dedup_rebuild_docs": "CCNet-style rebuild dedup (r15): chunking map-only (sequence/transform/posexplode); ONE window exchange keyed on chunk text for the global first-occurrence rank; ONE doc-keyed aggregation rebuilds surviving text in order (array_sort render) — two keyed shuffles total, high-cardinality keys, no skew",
    "robots_txt_filter_docs": "robots.txt politeness gate (r15): per-domain line explode -> gaps-and-islands group windows (keyed on domain, robots bodies KB-sized) -> rule set broadcast onto the probe side (zero shuffle on the corpus) -> ONE aggregation exchange",
    "cdx_capture_index_docs": "capture index (r15): binaryFile scan -> Arrow CDX kernel (per-record compressed-member extents + digest) -> explode, map-only, one task per file; the extent audit adds ONE window keyed by file; index emission is embarrassingly parallel over segments",
    "pagerank_link_domains": "fixed-iteration PageRank (r15): per round one src-keyed equi-join (rank side |nodes|-sized) + one dst-keyed aggregation + one node-keyed left join; stats-stripped checkpoint every 3 rounds truncates lineage; oracle unrolls the identical 5 rounds as a CTE chain",
    "anchor_text_profile_docs": "anchor-text aggregation (r15): map-side explode -> ONE (domain, term) aggregation exchange (spreads a mega-domain before the rollup) -> per-domain struct-max rollup (second, domain-keyed) — the facebook.com-at-100TB shape",
    "cdx_revisit_dedup_docs": "cross-crawl revisit detection (r15): two-crawl fixture writer (scaffolding) -> CDX map-only kernel, one task per file -> ONE surt-keyed aggregation over (surt, digest) header rows — payload bytes never shuffle; the digest decides revisit vs stored copy",
    "sitemap_inventory_docs": "sitemap inventory (r15): per-domain XML assembly is scaffolding (one groupBy); the graded path is map-only native-regexp block parsing -> explode -> ONE domain-keyed aggregation; one sitemap (<=50k URLs by protocol) = one row = one task",
}

HEADER_NOTES = """
r9 planning-layer note: iterative checkpoints (`linkage._checkpoint`,
used by every connected-components consumer) now STRIP the inherited
sizeInBytes estimate — checkpoint copies the origin plan's stats, and
the default join estimate is a product of child sizes, so CC rounds
compounded it into BigIntegers past the 2^31-bit ceiling at sf0.1+
(Catalyst then burned minutes of million-digit arithmetic per stats
call with executors idle). Stripping resets leaves to
defaultSizeInBytes; join strategies are unaffected because AQE picks
them from runtime shuffle sizes (pinned:
`test_linkage.py::test_checkpoint_strips_inherited_stats`; measured:
`fused_dedup_docs` at sf0.1 >10 min hang → 66 s).
"""


def main() -> None:
    from pyspark_deduplication_spark.plans.inspect import explain_str
    from pyspark_deduplication_spark.queries import CATALOG
    from pyspark_deduplication_spark.session import get_spark

    spark = get_spark("plans", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"

    out = [
        "# PLANS — finalized physical plans of the headline queries\n",
        "Generated by `python tools/dump_plans.py` at sf0.001 (plan shape is",
        "scale-invariant; AQE finalizes after execution). These are the plans",
        'the engine is DESIGNED to produce — "the plan you\'d want, not the',
        'first one that passed" — and tests/test_plans.py pins the properties.\n',
        HEADER_NOTES.strip() + "\n",
    ]
    for name, note in NOTES.items():
        df = CATALOG[name].fn(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        plan = explain_str(df)
        tree = plan.split("\n\n")[0]
        # strip plan ids for stable diffs
        tree = re.sub(r"#\d+L?", "", tree)
        out.append(f"## {name}\n\n*{note}*\n\n```\n{tree}\n```\n")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
