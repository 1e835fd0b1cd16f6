package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing: documents are concatenated in a stable
 * order and cut into fixed token-budget sequences — the step that turns
 * a filtered corpus into the packed rows an LLM trainer actually reads.
 *
 * This is the "stream packing" formulation (concatenate in order, cut
 * every `budget` tokens, assign each document to the sequence where it
 * starts): deterministic, one window pass, and expressible in ANSI SQL —
 * so the assignment is oracle-checkable, unlike greedy first-fit
 * bin-packing whose stateful scan is not.
 *
 * Scale design: the running sum is windowed PER SHARD (language, source,
 * or a hash bucket) — a single global window would serialize the corpus
 * through one partition. Real pipelines pack per output shard anyway,
 * since each trainer data file is written independently. At 100 TB,
 * shard by something with ≥ O(cluster cores) cardinality (e.g.
 * `pmod(hash(id), 4096)`), not a 5-value language column.
 */
object SequencePacking {

  /**
   * Assign each document to its training sequence. Output, per document:
   * shard, token count, sequence id within the shard, token offset where
   * the document starts inside that sequence, and whether it spills over
   * the sequence boundary (trainers either split those across sequences
   * or mask the overflow).
   */
  def pack(docs: DataFrame, textCol: String, idCol: String,
      budget: Int, shardCol: String): DataFrame =
    packCounted(docs, TextAnalysis.tokenCount(col(textCol)), idCol,
      budget, shardCol)

  /** [[pack]] with the shard DERIVED from the cluster: hash shards
    * whose cardinality is `sparkContext.defaultParallelism` — the same
    * track-the-runtime move as `planesForCount`/`nlistForCount`, so the
    * per-shard windows parallelize across exactly the cores available
    * instead of a caller-guessed constant. Pass an explicit `shardCol`
    * (the 5-arg overloads) when output sharding is semantic (per
    * language, per source) or must be reproducible across clusters. */
  def pack(docs: DataFrame, textCol: String, idCol: String,
      budget: Int): DataFrame =
    packCounted(docs, TextAnalysis.tokenCount(col(textCol)), idCol, budget)

  /** [[packCounted]] with the derived shard default (see 4-arg
    * [[pack]]). */
  def packCounted(docs: DataFrame, countExpr: org.apache.spark.sql.Column,
      idCol: String, budget: Int): DataFrame = {
    val shards =
      math.max(1, docs.sparkSession.sparkContext.defaultParallelism)
    packCounted(
      docs.withColumn("_auto_shard",
        pmod(xxhash64(col(idCol)), lit(shards.toLong))),
      countExpr, idCol, budget, "_auto_shard")
  }

  /** [[pack]] with a caller-supplied token-count expression — e.g.
    * `size(wordpiece_tokens(text))` for real tokenizer counts instead
    * of the whitespace proxy. */
  def packCounted(docs: DataFrame, countExpr: org.apache.spark.sql.Column,
      idCol: String, budget: Int, shardCol: String): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("doc_id"), col(shardCol).as("shard"),
        countExpr.cast("long").as("n_tokens"))
      // exclusive prefix sum: tokens before this doc in shard order
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"start_tok DIV $budget").as("seq_id"),
        (col("start_tok") % budget).as("seq_offset"),
        (col("start_tok") % budget + col("n_tokens") > budget)
          .as("spans_boundary"))
  }

  /**
   * Per-shard CARRY STATE for incremental packing: the running token
   * total and the highest packed id, rolled up from a [[packCounted]]
   * output (or a previous [[packCountedAppend]] union). One row per
   * shard — broadcastable at any corpus size.
   */
  def packTotals(packed: DataFrame): DataFrame =
    packed.groupBy("shard").agg(
      sum(col("n_tokens")).as("base_tok"),
      max(col("doc_id")).as("max_id"))

  /**
   * INCREMENTAL epoch packing: pack a NEW batch of documents onto the
   * running per-shard totals from previous epochs ([[packTotals]]) —
   * the growing-corpus discipline applied to packing: because the
   * stream order is doc_id and appended ids are strictly greater,
   * every already-written sequence assignment is PRESERVED and the
   * new docs continue exactly where the stream left off
   * (incremental ≡ batch, bit for bit — the gate).
   *
   * APPEND-ONLY CONTRACT, enforced in-plan: a new doc whose id is ≤
   * its shard's `max_id` would rewrite history (its insertion shifts
   * every later start offset) — such rows raise deterministically
   * (the [[shardByTokenBudget]] raise idiom) instead of silently
   * producing a packing that disagrees with the batch replay. Shards
   * unseen in the carry state start at offset 0.
   *
   * Scale: one broadcast join against the O(shards) carry relation +
   * the same per-shard window as [[packCounted]] over ONLY the new
   * epoch's rows — incremental cost tracks epoch size, not corpus
   * size.
   */
  def packCountedAppend(docs: DataFrame,
      countExpr: org.apache.spark.sql.Column, idCol: String,
      budget: Int, shardCol: String, totals: DataFrame): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the guard rides inside the base expression so it cannot be
    // pruned: any violating row poisons the offset it contributes to
    val base = when(col("max_id").isNotNull && col("doc_id") <= col("max_id"),
        expr("raise_error('packCountedAppend requires appended doc ids " +
          "to exceed the shard''s packed max_id — an insertion would " +
          "rewrite already-written sequences; rebuild instead')")
          .cast("long"))
      .otherwise(coalesce(col("base_tok"), lit(0L)))
    docs.select(col(idCol).as("doc_id"), col(shardCol).as("shard"),
        countExpr.cast("long").as("n_tokens"))
      .join(broadcast(totals), Seq("shard"), "left")
      .withColumn("start_tok",
        base + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"start_tok DIV $budget").as("seq_id"),
        (col("start_tok") % budget).as("seq_offset"),
        (col("start_tok") % budget + col("n_tokens") > budget)
          .as("spans_boundary"))
  }

  /**
   * Deterministic EPOCH-SHUFFLE ordering key: the engine's shared
   * md5-prefix hash over `epoch ‖ ':' ‖ id` — a pure function of
   * (epoch, key), so the shuffled order is stable across runs,
   * engines, cluster sizes and partitionings (the same portability
   * argument as `Sampling.bucket`), and DIFFERENT per epoch. Trainers
   * reshuffle the corpus between epochs; packing in raw id order
   * every epoch feeds documents in the same neighborhoods each pass.
   */
  def epochOrderKey(idCol: org.apache.spark.sql.Column,
      epoch: Long): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(epoch.toString), lit(":"),
      idCol.cast("string"))), 1, 15), 16, 10).cast("long")

  /**
   * [[packCounted]] under the EPOCH-SHUFFLED order: the per-shard
   * stream is concatenated in ([[epochOrderKey]], doc_id) order —
   * hash first, id as the total-order tie-break — then cut every
   * `budget` tokens exactly as [[packCounted]] does. Same output
   * schema; same scale shape (the window's sort key changes, nothing
   * else). Each epoch value yields a different, individually
   * reproducible packing of the same corpus.
   */
  def packShuffled(docs: DataFrame,
      countExpr: org.apache.spark.sql.Column, idCol: String,
      budget: Int, shardCol: String, epoch: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy("shard").orderBy("__ord", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("doc_id"), col(shardCol).as("shard"),
        countExpr.cast("long").as("n_tokens"),
        epochOrderKey(col(idCol), epoch).as("__ord"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("__ord").as("ord"),
        expr(s"start_tok DIV $budget").as("seq_id"),
        (col("start_tok") % budget).as("seq_offset"),
        (col("start_tok") % budget + col("n_tokens") > budget)
          .as("spans_boundary"))
  }

  /**
   * [[packSplit]] under the EPOCH-SHUFFLED order — the combination
   * real trainers run (reshuffle between epochs, then chop at every
   * boundary): the per-shard stream concatenates in
   * ([[epochOrderKey]], doc_id) order and fragments exactly as
   * [[packSplit]] does. Output adds `ord` (the order key) so the
   * in-sequence layout is reproducible downstream.
   */
  def packSplitShuffled(docs: DataFrame,
      countExpr: org.apache.spark.sql.Column, idCol: String,
      budget: Int, shardCol: String, epoch: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val b = lit(budget.toLong)
    val w = Window.partitionBy("shard").orderBy("__ord", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val segStart = greatest(col("start_tok"), col("seq_id") * b)
    val segEnd = least(col("start_tok") + col("n_tokens"),
      (col("seq_id") + lit(1L)) * b)
    docs.select(col(idCol).as("doc_id"), col(shardCol).as("shard"),
        countExpr.cast("long").as("n_tokens"),
        epochOrderKey(col(idCol), epoch).as("__ord"))
      .filter(col("n_tokens") > 0)
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("__last",
        expr(s"(start_tok + n_tokens - 1) DIV $budget"))
      .withColumn("n_frags",
        col("__last") - expr(s"start_tok DIV $budget") + lit(1L))
      .withColumn("seq_id",
        explode(sequence(expr(s"start_tok DIV $budget"), col("__last"))))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("__ord").as("ord"), col("seq_id"),
        (segStart - col("seq_id") * b).as("seq_offset"),
        (segStart - col("start_tok")).as("doc_offset"),
        (segEnd - segStart).as("frag_len"),
        col("n_frags"))
  }

  /**
   * SPLIT-ACROSS packing — the other half of the packing semantics:
   * where [[packCounted]] assigns each document to the sequence it
   * STARTS in (trainers then mask or spill the overflow),
   * `packSplit` emits one row per (document, sequence) FRAGMENT —
   * the GPT-style formulation where the concatenated shard stream is
   * chopped at every `budget` boundary and a document spanning k
   * boundaries appears in k+1 consecutive sequences. Per fragment:
   * the sequence id, the offset inside that sequence where the
   * fragment lands (`seq_offset`), the offset inside the DOCUMENT
   * where the fragment begins (`doc_offset` — what a loader seeks to
   * when re-reading the doc's token stream), the fragment length, and
   * the document's total fragment count (`n_frags` — 1 for non-spanning
   * docs). Invariants (spec-pinned): per-doc `sum(frag_len) =
   * n_tokens`; fragments tile the doc contiguously (`doc_offset` of
   * fragment i+1 = `doc_offset + frag_len` of fragment i); per
   * (shard, seq_id) `sum(frag_len) = budget` for every sequence
   * except each shard's last.
   *
   * Zero-token documents are dropped (they contribute no tokens to
   * any sequence — same contract as a trainer's empty-document
   * filter); gate emptiness upstream (quality filters already do).
   *
   * Scale: the per-shard window is [[packCounted]]'s; the explode is
   * map-side (each doc expands to ceil(n/budget)+1 ≤ rows) — no new
   * shuffle, no global window.
   */
  def packSplit(docs: DataFrame, countExpr: org.apache.spark.sql.Column,
      idCol: String, budget: Int, shardCol: String): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val b = lit(budget.toLong)
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val segStart = greatest(col("start_tok"), col("seq_id") * b)
    val segEnd = least(col("start_tok") + col("n_tokens"),
      (col("seq_id") + lit(1L)) * b)
    docs.select(col(idCol).as("doc_id"), col(shardCol).as("shard"),
        countExpr.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("__last",
        expr(s"(start_tok + n_tokens - 1) DIV $budget"))
      .withColumn("n_frags",
        col("__last") - expr(s"start_tok DIV $budget") + lit(1L))
      .withColumn("seq_id",
        explode(sequence(expr(s"start_tok DIV $budget"), col("__last"))))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("seq_id"),
        (segStart - col("seq_id") * b).as("seq_offset"),
        (segStart - col("start_tok")).as("doc_offset"),
        (segEnd - segStart).as("frag_len"),
        col("n_frags"))
  }

  /**
   * Per-sequence ASSEMBLY MANIFEST over [[packSplit]] fragments: one
   * row per (shard, seq_id) with the ordered fragment recipe a
   * trainer's loader executes — `manifest` is the `;`-joined list of
   * `doc_id:doc_offset:frag_len` triples in in-sequence order (each
   * triple: read the doc's token stream from `doc_offset`, take
   * `frag_len`), plus the roll-ups (`n_docs` fragments, `n_tokens`
   * total — `budget` for every sequence except each shard's last).
   * The string form (not array<struct>) keeps the row portable and
   * oracle-hashable; the triples are unambiguous because ids and
   * offsets are integers.
   *
   * Scale: one hash aggregation keyed (shard, seq_id) — the natural
   * write grain; rows are bounded by budget/min-fragment-size triples.
   */
  def sequenceManifest(frags: DataFrame): DataFrame =
    frags.groupBy("shard", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("frag_len").as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("seq_offset"),
            col("doc_id"), col("doc_offset"), col("frag_len")))),
          f => concat_ws(":", f("doc_id"), f("doc_offset"),
            f("frag_len"))), ";").as("manifest"))

  /** [[packSplit]] with the derived hash-shard default (see 4-arg
    * [[pack]]). */
  def packSplit(docs: DataFrame, countExpr: org.apache.spark.sql.Column,
      idCol: String, budget: Int): DataFrame = {
    val shards =
      math.max(1, docs.sparkSession.sparkContext.defaultParallelism)
    packSplit(
      docs.withColumn("_auto_shard",
        pmod(xxhash64(col(idCol)), lit(shards.toLong))),
      countExpr, idCol, budget, "_auto_shard")
  }

  /**
   * Token-budget OUTPUT SHARDING in one global concatenation order:
   * assign every document a `shard` such that each shard holds
   * ~`shardBudget` tokens of the id-ordered corpus stream — the layout
   * step that writes trainer data files of equal token volume (and, with
   * `df.write.partitionBy("shard")`, materializes them directly). Unlike
   * [[pack]], whose windows are per-shard BECAUSE each trainer file is
   * independent, this operator is for when one reproducible global order
   * must thread through all files (resumable training streams: file k
   * always starts at token k·budget of the corpus).
   *
   * Scale: the global exclusive prefix sum is computed WITHOUT a global
   * window (which would serialize the corpus through one partition) via
   * the classic two-phase scan: documents bucket by id range into
   * `buckets` groups (default: `defaultParallelism`), a per-bucket
   * window computes local prefixes in parallel, per-bucket totals reduce
   * to a `buckets`-row relation whose own prefix sum (a window over
   * O(cluster) rows) broadcasts back as offsets. The decomposition is
   * exact integer arithmetic — the result equals the naive global
   * window for ANY bucket count (spec-asserted), so the oracle replays
   * it as a single window.
   *
   * Output: doc_id, n_tokens, start_tok (exclusive prefix), shard.
   */
  def shardByTokenBudget(docs: DataFrame,
      countExpr: org.apache.spark.sql.Column, idCol: String,
      shardBudget: Long, buckets: Int = 0): DataFrame = {
    require(shardBudget > 0, "shard token budget must be positive")
    val nb = if (buckets > 0) buckets
      else math.max(1, docs.sparkSession.sparkContext.defaultParallelism)
    // two consumers (per-bucket totals + final assignment): materialize
    // the counted input once — upstream may be an expensive pipeline.
    // The id must cast to a non-null long (range bucketing and the
    // prefix sum are keyed on it): under non-ANSI configs a non-numeric
    // string id casts to null and silently corrupts the bucketing and
    // the emitted doc_id, so the cast is try_cast with an explicit
    // raise — deterministic, documented failure under ANY ansi setting.
    // coalesce keeps the check inside the row pipeline (an unused
    // assert column would be pruned away).
    val idAsLong = coalesce(col(idCol).try_cast("long"),
      expr("raise_error('shardByTokenBudget requires a non-null " +
        "numeric-castable id column')").cast("long"))
    val base = graft.operators.Materialized(
      docs.select(idAsLong.as("doc_id"),
        countExpr.cast("long").as("n_tokens")))
    val bounds = base.agg(min(col("doc_id")).as("__lo"),
      max(col("doc_id")).as("__hi"))
    val bucketed = base.crossJoin(broadcast(bounds))
      .withColumn("__b",
        expr(s"(doc_id - __lo) DIV ((__hi - __lo + $nb) DIV $nb)"))
      .drop("__lo", "__hi")
    val wLocal = Window.partitionBy("__b").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__local",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    val wOff = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__b")
      .agg(sum(col("n_tokens")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .drop("__t")
    local.join(broadcast(offsets), Seq("__b"))
      .withColumn("start_tok", col("__off") + col("__local"))
      .select(col("doc_id"), col("n_tokens"), col("start_tok"),
        expr(s"start_tok DIV $shardBudget").as("shard"))
  }

  /** Per-sequence roll-up of [[pack]]: how many documents and tokens
    * landed in each (shard, sequence) — the sanity report a packing run
    * emits (every sequence except each shard's last should start full). */
  def sequenceStats(packed: DataFrame): DataFrame =
    packed.groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        max(col("spans_boundary")).as("has_overflow"))
}
