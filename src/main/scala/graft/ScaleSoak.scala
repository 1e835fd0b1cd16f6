package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale rehearsal: runs the dedup family + corpus pipeline + connected
 * components + BOTH ANN paths over the sf0.1 corpus and synthesized
 * 10×/100× corpora with IDENTICAL duplicate density, and reports the
 * runtime ratio and the empirical scaling exponent α (t ∝ n^α) per
 * query — the "would this survive a scale-up" check behind the
 * plan-shape arguments. Rerun with `sbt "runMain graft.ScaleSoak"`
 * (`SOAK_FACTORS=1,10,100` to change the ladder); output is one JSON
 * line per query plus a PASS/WARN verdict: WARN when α > 1.2 AND the
 * max-factor ratio exceeds 15 (α alone over-flags tiny sub-second
 * absolute times where fixed overheads dominate the log-log slope).
 *
 * Replica construction preserves workload density (a naive copy would
 * make every replica a near-dup of the original and explode the pair
 * output quadratically — that would measure a different workload, not
 * scaling):
 *  - documents: replica k suffixes EVERY token with "q{k}" — zero token
 *    overlap across replicas, so cross-replica shingle jaccard AND
 *    simhash both decorrelate (suffixing only some tokens left 2/3
 *    token overlap, and simhash — locality-sensitive by design — nearly
 *    collided across replicas, densifying chunk buckets into a fake
 *    quadratic workload). Within-replica dup structure is preserved
 *    bit-for-bit (equal texts stay equal, near-dups stay near-dups).
 *  - embeddings: replica k applies a deterministic per-(k, component)
 *    sign flip — an ORTHOGONAL transform, so all within-replica cosines
 *    are preserved exactly while cross-replica cosines collapse toward
 *    0 (pseudo-random half flips).
 */
object ScaleSoak {

  private val Queries = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_pairs",
    "dedup_simhash_pairs", "dedup_corpus", "decontaminate_corpus",
    "dedup_incremental", "corpus_pipeline", "ann_lsh_pairs",
    "ann_ivf_topk",
    // cluster count derives from corpus size (nlistForCount), so the
    // within-cluster quadratic join must hold shape as n grows
    "semdedup_pairs",
    // brute-force over int8 codes: linear in corpus per query batch
    "ann_quantized_topk",
    // IVF+SQ8: work ∝ queries × nprobe × (n/nlist) — linear in n for a
    // fixed query batch even with the demo's fixed 8 cells
    "ann_ivf_sq8_topk",
    // ADC brute force over PQ codes: linear in corpus per query batch
    "ann_pq_topk",
    // IVF+PQ: probed cells + ADC — the canonical compressed production
    // layout; same linearity argument as IVF+SQ8
    "ann_ivf_pq_topk",
    // ── text/quality family (round-6 verdict #5: map-side/two-level-agg
    // CLAIMS, now measured) ──
    // one codegen'd kernel call per document, zero shuffle
    "gopher_repetition",
    // map-side wordpiece explode — linear in corpus characters
    "tokenize_documents",
    // real-token packing: per-shard cumulative window over 16 hash
    // shards — the α here prices the fixed shard-parallelism claim
    "pack_sequences_bpe",
    // two-level agg (df + tf) + broadcast term join
    "bm25_search",
    // batch-vs-index semantic dedup epoch (batch grows with the corpus;
    // the probe join must stay linear in the batch)
    "semdedup_incremental",
    // the full production serving path: bounded-sample trainers
    // (≤4096 rows regardless of n) + linear index encode/write + DPP
    // probe + bounded rerank — build cost should scale ~linearly, the
    // serve side stays probe-bounded
    "ann_production_topk",
    // text keeper chain + SemDeDup over the survivors' embeddings —
    // the two-table flagship composition; inherits corpus_pipeline's
    // shapes plus one semi-join and the bounded within-cluster joins
    "corpus_pipeline_semantic",
    // ── round-7 trained-filter + substring-dedup additions ──
    // NB training = two hash aggs over exploded tokens; the MODEL grows
    // with observed vocab (replicas have disjoint vocab by construction,
    // so this ladder prices the worst case for the term-table join)
    "classify_lang_nb",
    // DSIR: model is exactly `buckets` rows at ANY corpus size — the
    // fixed-alphabet contrast to NB's growing term table; scoring is a
    // broadcast join + one per-doc combine
    "dsir_importance",
    // substring windows: inverted index + df cap + exact verify — the
    // same bounded-fan-out shape as dedup_ngram_pairs at w-token grain
    "dedup_substring_pairs",
    // ── round-8 additions ──
    // hashed-alphabet NB: the model must stay ≤ buckets × classes rows
    // at every factor (reported as model_rows on this query's line) —
    // the fixed-alphabet contrast the ladder prices for exact-vocab NB
    "classify_lang_nb_hashed",
    // substring excision: windowPairs' shapes + the candidate-bounded
    // token rebuild (corpus-wide work stays hash-only postings)
    "dedup_substring_excise",
    // perceptual image dedup: map-side decode+dHash, then the wide-key
    // banding over distinct 64-bit fingerprints
    "dedup_image_pairs",
    // audio envelope fingerprints: identical tail (shared banding),
    // map-side WAV decode + 33-frame fold
    "dedup_audio_pairs",
    // ── round-8 beyond-the-asks additions ──
    // Bloom-prefiltered decontamination: output-identical twin of
    // decontaminate_corpus whose pairing shuffle is gated map-side by
    // the bench shingle sketch and whose df cap ships as a broadcast
    // hot-set — laddered against the equi-join row above to price the
    // restructure (the sketch is registered once per factor dir,
    // outside the steady-state timing by the warmup discipline)
    "decontaminate_bloom_corpus",
    // pHash: map-side decode + integer-DCT fingerprint, then the same
    // shared banding tail as dedup_image_pairs
    "dedup_image_pairs_phash",
    // video frame-digest sets through the shared set-Jaccard core —
    // inherits dedup_ngram_pairs' candidates-first shapes at frame
    // grain (fewer, coarser elements per document)
    "dedup_video_pairs",
    // cluster-balanced selection: broadcast-centroid assignment + one
    // ranking window per cluster — the window sort is the only
    // super-constant piece and must stay n·log n within clusters
    "sample_balanced_clusters",
    // ── round-8 session-3 additions ──
    // temperature mixture: broadcast class-count relations + a map-side
    // hash gate — must stay flat-per-row like byMixture
    "sample_temperature_mixture",
    // CCNet perplexity triage: scoreDocs' agg shapes + ONE window over
    // the bounded 4-dp score histogram (cells track score range, not n)
    "quality_perplexity_buckets",
    // two-phase global prefix sum: per-bucket windows parallelize, the
    // offsets window is O(buckets) rows — must not serialize the corpus
    "shard_token_budget",
    // BPE training: explode + hash agg to the bounded top-K sample
    // (driver loop is corpus-size-independent)
    "bpe_train_merges",
    // BPE encoding: numMerges codegen'd replaces per token, map-side
    // only — linear in corpus characters like tokenize_documents
    "bpe_encode",
    // unigram-LM trainer: corpus work is ONE explode + hash agg to the
    // bounded type sample; the Viterbi-EM loop is driver-bounded
    // (≤ topK types) — must ladder like bpe_train_merges
    "tokenize_unigram_vocab",
    // unigram encoding: one O(len × maxPieceLen) Viterbi kernel DP per
    // word, model as a plan literal, map-side only — linear in corpus
    // characters; digest action (pure projection, count() would prune)
    "tokenize_unigram",
    // PCA fit: the mean pass + the d²-key outer-product hash agg (O(d²)
    // map-side work per row, 4096-key shuffle); the eigen-solve is
    // matrix-bounded — the ladder tracks the two corpus passes
    "embed_pca_components",
    // PCA projection (includes its fit): map-side exact integer dots,
    // model as plan literals; digest action (pure projection)
    "embed_pca_project",
    // the four-gate quality stack: Gopher/C4 map-side projections, the
    // LR broadcast-model scoring agg, the LM bounded-histogram triage,
    // joined at doc grain — the composed curation decision plan
    "curate_quality_stack",
    // trained counts driving the per-shard packing windows
    "pack_sequences_trained",
    // label-filtered IVF probe path: same probe-bounded shape as
    // ann_ivf_topk with the mismatch filter ahead of the rank window
    "ann_hard_negatives",
    // canonicalization kernel: one codegen'd call per row, zero shuffle
    "normalize_documents",
    // DSIR selection end state: the importance pass + the bounded
    // micro-unit histogram cut (cells track score range, not n)
    "dsir_top_select",
    // cross-corpus LM: target-side model aggs + corpus-side left joins
    // — the scoreDocs family's shapes with a 10%-sized model side
    "lm_cross_scores",
    // ── round-9 additions ──
    // edge-fed audio corpus end state: star+bridge edges (LINEAR in
    // docs) feed connected components — the ~10⁸-row quadratic pair
    // frame that OOM'd the first round-8 full ladder is out of this
    // query's loop entirely; the row reports edge_rows per factor
    // (must track docs, not pairs) as the boundedness evidence
    "dedup_audio_corpus",
    // NOTE dedup_audio_pairs_shifted is deliberately NOT laddered: its
    // OUTPUT is the doc-pair set, and on the replica corpus — where the
    // envelope's perceptual robustness already densified whole-clip
    // pairs 62 800× (SOAK_r08 ‡) — the ~6 windows/clip multiply that
    // into an OOM-scale pair frame. That is the pair REPORT being
    // quadratic by definition, not a plan defect; the scale path for
    // shifted dedup is the EDGE-fed corpus end state, laddered below.
    "dedup_audio_corpus_shifted",
    // KN trigram LM: model = hash aggs of the distinct-trigram relation,
    // scoring = key joins — the scoreDocs shapes one order higher
    "lm_kn_scores",
    // domain curation: map-side regex + blocklist filter (flat), and the
    // per-domain cap's ranking window (n·log n within domains)
    "curate_domain_filter",
    "sample_domain_cap",
    // curation-first pipeline: the domain gate/cap shapes + the keeper
    // chain over the curated subset — inherits corpus_pipeline's
    // shapes with a smaller text-stage input
    "corpus_pipeline_curated",
    // cross-corpus KN: target-side model aggs + corpus-side LEFT joins
    // — lm_cross_scores' shapes at trigram order with backoff CASEs
    "lm_kn_cross_scores",
    // C4 line cleaning: one map-side array/regex projection — must
    // ladder flat like the other kernel passes
    "c4_line_filter",
    // corpus-line dedup: posexplode + line-grain df agg + anti join +
    // per-doc rebuild — the inverted-index shape at line grain
    "dedup_corpus_lines",
    // ── round-10 additions ──
    // supervised LR quality training: fixed GD iterations, each = one
    // broadcast-model join + one buckets-bounded gradient agg over the
    // hashed-cell relation — iterations are corpus-size-independent, so
    // the whole train should ladder linearly
    "classify_quality_lr",
    // modified-KN: lm_kn_scores' shapes + one count-of-counts agg per
    // order (the discount relation is O(1) rows)
    "lm_kn_mod_scores",
    // 5-gram modified-KN (the CCNet order): the same recursion over
    // five vocab-sized type-count relations — wider keys, same join
    // grain, so the ladder should match the trigram α
    "lm_kn5_scores",
    // orientation-canonical pHash fingerprints: decode + 8 cell/DCT
    // passes per image, pure map side (mapPartitions — not prunable)
    "image_phash_dihedral",
    // alignment-free (silence-trimmed) audio corpus end state — the
    // edge-fed formulation; its PAIR report (dedup_audio_pairs_aligned)
    // is deliberately not laddered for the same reason as the shifted
    // pair row above
    "dedup_audio_corpus_aligned",
    // ── round-11 additions ──
    // multiclass softmax LR training: per iteration one broadcast-model
    // join, two doc-partitioned windows over the (docs × K) frame, one
    // doc_id join and two bounded-key gradient aggs — K× the binary
    // trainer's per-iteration cost, iterations corpus-size-independent,
    // so the train should ladder linearly like classify_quality_lr
    "classify_langid_lr",
    // SERVE-ONLY rows (round-7 verdict #7): the artifact is built once
    // per factor OUTSIDE the timed region via SparkEntry.buildServe,
    // and only the read path is laddered — the serving α is measured,
    // not inherited from the conflated build+serve query
    "classify_lang_nb_serve",
    "ann_ivf_pq_index_serve",
    // BM25 serving from the persisted bucket-pruned index: the read
    // path should scale with the query terms' postings, not the corpus
    "bm25_index_serve",
    // LR scoring from the persisted weight vector: broadcast-model join
    // + map-side dot product — must ladder like the NB serve row
    "classify_quality_lr_serve",
    // RRF fusion of the two persisted serve paths: postings-bounded
    // lexical + probe-bounded vector + an O(topK) rank fold
    "search_hybrid_rrf_serve",
    // softmax scoring from the persisted (cell, class) weight table:
    // broadcast-model join + two doc-partitioned windows — the serve
    // path must ladder like the binary LR serve row
    "classify_langid_lr_serve",
    // batched BM25 serving: the DPP-pruned postings join — must scale
    // with the batch's postings, not the corpus
    "bm25_multi_serve",
    // multi-query hybrid fusion: per-query_id windows over the two
    // batched serve paths
    "search_hybrid_rrf_multi_serve",
    // WARC-story extraction kernel: one codegen'd block-classification
    // pass per row, zero shuffle — digest action (pure projection)
    "extract_html_text",
    // OPQ trainer + rotated-space ADC: the alternation is driver-side
    // over the bounded ≤4096-row sample (corpus-size-independent, like
    // bpe_train_merges), then one map-side rotation kernel per row
    // ahead of ann_pq_topk's linear ADC scan — α must track the PQ row
    "ann_opq_topk",
    // streaming quality stack SERVE path: artifacts built once per
    // factor outside the timed region; the ladder prices the per-batch
    // gate plan (two kernel projections + the broadcast-model LR agg +
    // the bigram join against the vocab-sized pair relation + a 1-row
    // threshold broadcast) — must inherit its components' linear αs
    "curate_quality_stack_serve",
    // the full CCNet composition: softmax langid serve (broadcast
    // model + per-doc windows) + per-language bigram LMs in one plan
    // (scoreDocs' shapes with (lang, gram) keys) + per-language
    // quantile windows over the bounded (langs × score-range)
    // histogram — the α must track quality_perplexity_buckets'
    "ccnet_lang_triage",
    // OPQ production serve (OPQ8,IVF8,PQ8,Refine(Flat)): rotated-code
    // index built untimed per factor; the ladder prices the probe +
    // ADC + bounded original-float rerank — must track the
    // ann_production_topk serve shape
    "ann_opq_production_serve",
    // ── round-13 additions ──
    // byte-level BPE encoding: the same map-side numMerges-replace plan
    // as bpe_encode over the hex-sealed byte alphabet (~2× the symbol
    // stream of the char seal) — α must track bpe_encode's
    "bpe_byte_encode",
    // pretokenized byte BPE: one regexp_extract_all per row ahead of
    // the same fold — still map-side, must track bpe_byte_encode's α
    "bpe_byte_pretok_encode",
    // per-language stack: the corpus stack's rule/LR gates plus the
    // softmax-langid serve, per-language bigram LMs and TWO per-group
    // bounded-histogram quantile cuts — must inherit the linear αs of
    // curate_quality_stack and ccnet_lang_triage
    "curate_quality_stack_multilingual",
    // dedup evaluation mart: planted corpus ≤ 4 rows per distinct text
    // (replicas are token-suffixed, so originals grow linearly and
    // variants never pair across replicas), every detector the
    // production capped plan, report a broadcast-size aggregation
    "dedup_eval_report",
    // incremental ANN serve: the grown (batch_id, cluster) layout read
    // through the unchanged probe-pruned reader — must track
    // ann_ivf_pq_index_serve
    "ann_index_incremental_serve",
    // incremental BM25 serve: the grown (batch_id, bucket) postings
    // read bucket-pruned with merge-on-read df + epoch-partial stats —
    // must track bm25_index_serve (postings-bounded, corpus-flat)
    "bm25_index_incremental_serve",
    // semantic decontamination: train side map-side-assigned (shuffle
    // on cluster only), bench side a bounded probe relation — the
    // pairing must inherit semdedup_pairs' shape, with the bench join
    // side CONSTANT as the corpus grows
    "decontaminate_semantic_pairs",
    // hybrid fusion over the INCREMENTALLY-grown pair of indexes —
    // must track search_hybrid_rrf_serve (postings- and probe-bounded)
    "search_hybrid_rrf_incremental_serve",
    // soft dedup: one digest hash-agg + a join back on the 16-byte key
    // — must inherit dedup_exact's flat digest-aggregation α
    "dedup_soft_weights",
    // ── round-14 additions ──
    // (bpe_byte_encode / bpe_byte_pretok_encode above now run the
    // rank-sequential KERNEL serving path — their rows re-pin the new
    // plan shape replacing the numMerges-replace fold)
    // quantile sketch: one hash agg carrying 16·k bytes per group —
    // must inherit the HLL row's flat aggregation-tree α
    "approx_quantile_scores",
    // grown sample partials merged on read (epoch-count × k rows per
    // group) + the same estimate — epoch writes + a bounded merge
    "approx_quantile_incremental",
    // retrain response: serve through the RESOLVED pointer over the
    // rebuilt (batch_id=0, cluster) layout — must track
    // ann_index_incremental_serve (probe-pruned, corpus-linear build)
    "ann_index_reindex_serve",
    // tombstone-epoch delete + survivors serve: the incremental
    // soft-dedup shape plus one negative epoch — digest-grain merge
    "dedup_soft_weights_delete",
    // sketch GATES: one (grouped) sketch aggregate + a broadcast
    // threshold join + a map-side filter — must stay corpus-flat like
    // approx_quantile_scores
    "curate_top_fraction_sketch",
    "curate_top_fraction_sketch_by_lang",
    // weighted sampling over soft-dedup weights: the digest-agg shape
    // plus a map-side hash filter — must inherit dedup_soft_weights' α
    "dedup_soft_sample",
    // ── round-15 additions ──
    // release-mart capstone: quality gate → soft-dedup sample → trained
    // BPE counts (kernel) → per-lang pack window → global two-phase
    // token sharding — the composed mart must stay near-linear (the
    // windows are per-shard / per-bucket, never one global partition)
    "corpus_release",
    // specials text kernel: ONE StaticInvoke per document (split +
    // pretokenize + bounded byte kernel in-JVM) — must track the
    // bpe_byte_pretok_encode kernel row
    "bpe_specials_serve",
    // production-shape PQ codebook (m=8, ksub=256): the 16384-double
    // literal + 2048-cell argmin per row — map-side, corpus-linear
    "pq_encode_256",
    // split-across packing: packCounted's per-shard window plus a
    // map-side explode of ≤ ceil(n/budget)+1 fragments per doc — must
    // inherit pack_sequences' α (no new shuffle)
    "pack_fragments",
    // sequence assembly manifest: the fragment shapes + ONE hash
    // aggregation keyed (shard, seq_id) — the natural write grain
    "pack_manifest",
    // epoch-shuffled packing: same per-shard window with a hash sort
    // key — must track pack_sequences' α (the sort is per-shard either
    // way; only the key changes)
    "pack_sequences_epoch",
    // the release mart's loader artifact: the shared counted sample
    // (persisted once per session+dir) through packSplit + the
    // manifest agg — corpus_release's shapes plus the fragment
    // explode and one (shard, seq) aggregation
    "corpus_release_manifest",
    // assembled-sequence content gate: per-doc kernel ids exploded to
    // token grain, doc_id-joined to fragments, digested per sequence —
    // the loader's real materialization cost, linear in corpus tokens
    "corpus_release_sequences",
    // epoch-shuffled split packing: the pack_fragments shapes with the
    // hash sort key — must track pack_fragments' α
    "pack_fragments_epoch",
    // incremental epoch packing: batch window over epoch 0 + append
    // windows over later epochs against the broadcast O(shards) carry
    // — incremental cost must track epoch size, not corpus size
    "pack_sequences_incremental",
    // WordPiece training: one explode + hash agg to the bounded type
    // sample, driver heap loop corpus-size-independent — must ladder
    // like bpe_train_merges / tokenize_unigram_vocab
    "wordpiece_train_merges",
    // WordPiece id serving from the loaded tokenizer.json: ONE greedy
    // longest-match StaticInvoke per document (LINEAR in word length —
    // no chunking bound needed, unlike the BPE merge kernel), model
    // blob as a plan literal; digest action (pure projection)
    "wordpiece_ids_serve",
    // type-2 SCD fold: per epoch ONE key-partitioned full-outer join
    // (open slice × snapshot) + a map-side ≤2-row emission — no global
    // window, so the 3-epoch history must ladder linearly in keys
    "scd2_documents_history",
    // iterative graph centrality: 10 rounds of (edges ⋈ ranks on src +
    // dst agg + node left join), rank frame localCheckpoint'ed per
    // round — each round is edge-proportional, so the ladder must be
    // linear in the near-dup edge set (which grows with docs)
    "pagerank_dedup_graph",
    // incremental components fold: 3 star-contraction runs over (label
    // stars ∪ epoch edges) — per-epoch work proportional to labeled
    // nodes + epoch edges, so the fold must ladder like the one-shot
    // dedup_components (which it must bit-equal)
    "dedup_components_incremental",
    // exact triangle enumeration: two endpoint-keyed joins + a semi
    // probe — work is wedge-bounded (Σ deg² over the near-dup graph),
    // which stays linear while replica clusters keep bounded degree
    "graph_triangles")

  /** Ladder name → buildServe key for the serve-only rows. */
  private val ServeOnly: Map[String, String] = Map(
    "classify_lang_nb_serve" -> "classify_lang_nb_from_model",
    "ann_ivf_pq_index_serve" -> "ann_ivf_pq_index_topk",
    "bm25_index_serve" -> "bm25_index_search",
    "classify_quality_lr_serve" -> "classify_quality_lr_from_model",
    "search_hybrid_rrf_serve" -> "search_hybrid_rrf",
    "classify_langid_lr_serve" -> "classify_langid_lr_from_model",
    "bm25_multi_serve" -> "bm25_multi_query",
    "search_hybrid_rrf_multi_serve" -> "search_hybrid_rrf_multi",
    "curate_quality_stack_serve" -> "curate_quality_stack_streaming",
    "ann_opq_production_serve" -> "ann_opq_production_topk",
    "ann_index_incremental_serve" -> "ann_index_incremental",
    "bm25_index_incremental_serve" -> "bm25_index_incremental",
    "search_hybrid_rrf_incremental_serve" -> "search_hybrid_rrf_incremental",
    "ann_index_reindex_serve" -> "ann_index_reindex",
    "bpe_specials_serve" -> "bpe_specials_roundtrip_encode_ids",
    "wordpiece_ids_serve" -> "wordpiece_hf_roundtrip_encode_ids")

  /** Queries whose registered plan is a pure map-side projection: under
    * a `count()` action Catalyst prunes the kernel expressions entirely,
    * so the r9 ladder's flat α rows proved scan-only plan shape, not
    * kernel throughput (SOAK_r09 caveat). For these the soak action is
    * a digest aggregate — xxhash64 folded over EVERY output column —
    * which forces each kernel to run over every row while adding only
    * one O(1)-row aggregate. The fold is bit_xor, not sum: sum over
    * full-range 64-bit hashes overflows under ANSI mode, xor cannot. */
  private val DigestQueries = Set(
    "c4_line_filter", "normalize_documents", "gopher_repetition",
    "tokenize_unigram", "embed_pca_project", "extract_html_text",
    // pure map-side projection (doc_id, count, digest) — count() would
    // prune the specials text kernel entirely (the r9 caveat)
    "bpe_specials_serve",
    // same shape: count() would prune the wordpiece ids kernel
    "wordpiece_ids_serve")

  private def digestAction(df: DataFrame): Unit = {
    df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).head()
    ()
  }

  def main(args: Array[String]): Unit = {
    // Storage must never starve execution at the 100× leg: the default
    // storageFraction (0.5) PROTECTS up to half the unified region for
    // cached blocks, and with 32 concurrent sorters a leg that still
    // holds Materialized/localCheckpoint blocks from the running
    // query's own shared frames can leave execution "got 0" on a 64 KB
    // request (UNABLE_TO_ACQUIRE_MEMORY — observed twice on different
    // queries that individually pass). Shrinking the protected floor
    // to 10% lets execution evict cached blocks to disk instead of
    // dying; correctness is unaffected (blocks are MEMORY_AND_DISK)
    // and timing rows keep their meaning (eviction cost is the honest
    // price of the pressure). Set BEFORE the session is created —
    // memory-manager fractions are read at SparkEnv construction.
    System.setProperty("spark.memory.storageFraction", "0.1")
    val spark = GraftSession.local("graft-soak")
    val src = sys.env.getOrElse("SOAK_SRC", "/root/testdata/sf0.1")
    val base = sys.env.getOrElse("SOAK_DIR", "/tmp/graft_soak")
    val factors = sys.env.getOrElse("SOAK_FACTORS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq.sorted
    // Focused reruns: SOAK_QUERIES=a,b filters the ladder to named
    // queries; SOAK_SKIP_BUILD=1 reuses corpora a prior run built.
    val queries = sys.env.get("SOAK_QUERIES") match {
      case Some(qs) =>
        val named = qs.split(",").map(_.trim).toSeq
        val unknown = named.filterNot(Queries.contains)
        require(unknown.isEmpty,
          s"unknown SOAK_QUERIES ${unknown.mkString(", ")}; " +
            s"valid: ${Queries.mkString(", ")}")
        named
      case None => Queries
    }
    val fMax = factors.max
    if (!sys.env.contains("SOAK_SKIP_BUILD")) factors.foreach { f =>
      val t0 = System.nanoTime()
      build(spark, src, s"$base/x$f", f)
      println(f"""{"build":"x$f","sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }

    // Fingerprint of the EXECUTED (post-AQE) plan: the multiset of
    // join/exchange/aggregate node names. Identical fingerprints at x1
    // and x{max} mean the capped-index plan SHAPE is size-invariant
    // (AQE may legitimately flip a join strategy — that shows up as a
    // DIFF and is reported, not hidden).
    def planShape(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
      df.queryExecution.executedPlan.collect {
        case p if p.nodeName.contains("Join") ||
          p.nodeName.contains("Exchange") ||
          p.nodeName.contains("Aggregate") => p.nodeName
      }.groupBy(identity).map { case (k, v) => k -> v.size }

    def timeAll(dir: String): Map[String, (Double, Map[String, Int])] =
      queries.map { q =>
        // run twice; report the second (steady state: shared frames
        // cached, codegen warm) — mirrors the bench's warmup discipline
        var shape = Map.empty[String, Int]
        // serve-only rows: build the artifact once, untimed; ladder the
        // read path alone
        val run: () => org.apache.spark.sql.DataFrame = ServeOnly.get(q) match {
          case Some(bsName) =>
            val serve = SparkEntry.buildServe(bsName)(spark, dir)
            () => serve()
          case None => () => SparkEntry.queries(q)(spark, dir)
        }
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val df = run()
          if (DigestQueries(q)) digestAction(df) else df.count()
          shape = planShape(df)
          (System.nanoTime() - t0) / 1e9
        }
        // progress line PER ROW (flushed): a ladder that dies mid-run
        // (the r9 first full-ladder OOM) must say which query killed it
        // — the batch results only print at the very end
        println(f"""{"progress":"$q","dir":"$dir","sec":${times.last}%.3f}""")
        // outside the timed region: a GC lets the ContextCleaner reap
        // the query's now-unreachable localCheckpoint blocks — its own
        // periodic GC is 30 min, far longer than a leg, so checkpoint
        // zombies from earlier queries otherwise pile up until a later
        // query's broadcast build OOMs (observed twice at 100×, at
        // DIFFERENT queries — classic accumulated-pressure flakiness)
        System.gc()
        q -> (times.last, shape)
      }.toMap

    val timed = factors.map { f =>
      val dir = s"$base/x$f"
      val out = f -> timeAll(dir)
      // drop this factor's shared cached frames before the next corpus:
      // three corpora's worth of persisted pair frames (the 100× audio
      // frame alone is ~10⁸ rows) otherwise accumulate and starve the
      // broadcast builds of the later factors. The registry sweep does
      // not see Materialized localCheckpoints, so finish with a full
      // persistent-RDD sweep + GC — between legs NOTHING should stay
      // cached, warm frames are rebuilt per corpus anyway
      SparkEntry.releaseSharedFrames(spark, dir)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      out
    }.toMap
    println(s"=== SOAK RESULTS (${fMax}x corpus vs 1x, steady-state seconds) ===")
    var worst = 0.0
    queries.foreach { q =>
      val t1 = timed(factors.min)(q)._1
      val tN = timed(fMax)(q)._1
      val ratio = tN / math.max(t1, 1e-3)
      // Empirical scaling exponent over the MEASURED span: t ∝ n^α ⇒
      // α = log ratio / log(fMax/fMin) — dividing by log fMax alone
      // understates α whenever the ladder doesn't start at 1×.
      // α ≈ 1 is linear; sub-linear happens when fixed overheads dominate.
      val span = fMax.toDouble / factors.min
      val alpha = if (span <= 1.0) 0.0
        else math.log(math.max(ratio, 1e-3)) / math.log(span)
      worst = math.max(worst, alpha)
      val verdict = if (alpha <= 1.2 || ratio <= 15.0) "PASS" else "WARN"
      val s1 = timed(factors.min)(q)._2
      val sN = timed(fMax)(q)._2
      val shapeNote =
        if (s1 == sN) "SAME"
        else {
          val d1 = (s1.toSet -- sN.toSet).toSeq.sorted
          val dN = (sN.toSet -- s1.toSet).toSeq.sorted
          s"DIFF x1-only=$d1 x$fMax-only=$dN"
        }
      val secs = factors.map(f =>
        f""""x$f":${"%.3f".formatLocal(java.util.Locale.ROOT, timed(f)(q)._1)}""")
        .mkString("{", ",", "}")
      // hashed-NB boundedness evidence: the model's non-zero cell table
      // at each factor (must stay ≤ buckets × classes — FLAT while the
      // corpus and its vocab grow 100×)
      val extra =
        if (q == "classify_lang_nb_hashed")
          factors.map(f => f""""x$f":${
            graft.text.Classifier.nbHashedModelRows(
              Demo.table(spark, s"$base/x$f", "documents"),
              "text", "doc_id", "lang")}""")
            .mkString(""","model_rows":{""", ",", "}")
        // edge-vs-docs boundedness: the CC feed must grow with the
        // corpus, never with dup-group size squared (pair frames do)
        else if (q == "dedup_audio_corpus")
          factors.map(f => f""""x$f":${
            SparkEntry.audioEdgeRows(spark, s"$base/x$f")}""")
            .mkString(""","edge_rows":{""", ",", "}") +
          factors.map(f => f""""x$f":${
            Demo.table(spark, s"$base/x$f", "documents").count()}""")
            .mkString(""","docs":{""", ",", "}")
        else ""
      println(f"""{"query":"$q","secs":$secs,"ratio_x$fMax":$ratio%.2f,"alpha":$alpha%.3f,"verdict":"$verdict","plan_shape":"$shapeNote"$extra}""")
    }
    if (queries == Queries) runExtras(spark, base, factors, fMax)
    println(f"""{"metric":"soak_worst_alpha","value":$worst%.3f,"factor":$fMax}""")
    spark.stop()
  }

  /** The two deliberately-approximate / anti-pattern measurements that
    * only make sense on a full-ladder run. */
  private def runExtras(spark: SparkSession, base: String,
      factors: Seq[Int], fMax: Int): Unit = {
    // Chunk-banded simhash with the df-style cap: the APPROXIMATE
    // configuration (the registered default is the exact wide-key plan,
    // timed in the main loop). The cap bounds hot-chunk fan-out; pair
    // counts vs the wide plan quantify the recall trade at each factor.
    def chunkedTimed(dir: String, cap: Option[Long]): (Double, Long) = {
      var rows = 0L
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        rows = graft.dedup.TextDedup.simhashPairsChunked(
          Demo.table(spark, dir, "documents"), "text", "doc_id",
          maxChunkFreq = cap).count()
        (System.nanoTime() - t0) / 1e9
      }.last
      (t, rows)
    }
    val chunked = factors.map(f => f -> chunkedTimed(s"$base/x$f", Some(200L))).toMap
    val (_, wideMaxPairs) = {
      val df = SparkEntry.queries("dedup_simhash_pairs")(spark, s"$base/x$fMax")
      (0.0, df.count())
    }
    val cSecs = factors.map(f =>
      f""""x$f":${"%.3f".formatLocal(java.util.Locale.ROOT, chunked(f)._1)}""")
      .mkString("{", ",", "}")
    val cRatio = chunked(fMax)._1 / math.max(chunked(factors.min)._1, 1e-3)
    println(f"""{"query":"dedup_simhash_pairs_chunked_capped","secs":$cSecs,"ratio_x$fMax":$cRatio%.2f,"x${fMax}_pairs_capped":${chunked(fMax)._2},"x${fMax}_pairs_exact_wide":$wideMaxPairs,"note":"maxChunkFreq=200 bounds hot-chunk fan-out; wide plan is the exact default"}""")
    // Fixed-plane LSH is the KNOWN superlinear failure mode the
    // registered default no longer has (planes now scale with n).
    // Measure it at the mid factor only — at x100 a 2^8-bucket table
    // over 200k vectors is a deliberate quadratic we refuse to run.
    val midF = factors.filter(f => f > factors.min && f < fMax)
      .sorted.headOption.getOrElse(fMax)
    def lshFixedTimed(dir: String): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.embeddings.EmbeddingOps.lshCosinePairs(
          Demo.table(spark, dir, "embeddings"), "embedding", "vec_id",
          threshold = 0.45, numPlanes = 8).count()
        (System.nanoTime() - t0) / 1e9
      }.last
    val lf1 = lshFixedTimed(s"$base/x${factors.min}")
    val lfM = lshFixedTimed(s"$base/x$midF")
    println(f"""{"query":"ann_lsh_pairs_fixed8","x${factors.min}_sec":$lf1%.3f,"x${midF}_sec":$lfM%.3f,"ratio":${lfM / math.max(lf1, 1e-3)}%.2f,"note":"fixed 8 planes, x$midF only - the superlinear mode the auto default (planesForCount) removes; x$fMax deliberately not run"}""")
  }

  /** Write documents.parquet + embeddings.parquet with `k` density-
    * preserving replicas of the source corpus into `dir`. */
  def build(spark: SparkSession, src: String, dir: String, k: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    replicateDocs(docs, k).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    replicateEmbeddings(embs, k).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
  }

  /** Replica id stride: derived from max(id)+1, NOT a fixed constant —
    * a fixed 1e6 stride silently collides replicas with originals the
    * moment the source corpus has ids ≥ 1e6, and the soak would then
    * measure a corrupted workload. */
  private def idStride(df: DataFrame, idCol: String): Long =
    df.agg(max(col(idCol))).head().getLong(0) + 1L

  private[graft] def replicateDocs(docs: DataFrame, k: Int): DataFrame = {
    val stride = idStride(docs, "doc_id")
    (0 until k).map { rep =>
      if (rep == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(rep * stride))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"q$rep"))),
          " "))
    }.reduce(_ unionByName _)
  }

  private[graft] def replicateEmbeddings(embs: DataFrame, k: Int): DataFrame = {
    val stride = idStride(embs, "vec_id")
    (0 until k).map { rep =>
      if (rep == 0) embs
      else embs
        .withColumn("vec_id", col("vec_id") + lit(rep * stride))
        .withColumn("embedding",
          zip_with(
            col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            // deterministic ±1 per (rep, component): md5 parity — the
            // same portable hash construction the sampler uses
            (x, i) => x * (lit(1.0) - lit(2.0) *
              (conv(substring(md5(concat(lit(s"$rep:"), i)), 1, 15), 16, 10)
                .cast("long") % 2).cast("double")).cast("float")))
    }.reduce(_ unionByName _)
  }
}
