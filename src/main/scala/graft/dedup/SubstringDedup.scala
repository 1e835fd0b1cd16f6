package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Substring-level exact dedup — the finer-grained sibling of the
 * document-level families in [[TextDedup]]: two documents are
 * substring-duplicates when they share at least one exact run of
 * `windowTokens` consecutive tokens (Lee et al. 2021, "Deduplicating
 * Training Data Makes Language Models Better", which dedups exact
 * 50-token substrings via a suffix array). Catches boilerplate reuse,
 * quotation and template overlap that whole-document hashing misses and
 * shingle-Jaccard only sees once overlap dominates the documents.
 *
 * Distributed formulation (a suffix array is a single-machine
 * construction): every length-w token window is emitted once per
 * position, keyed by the engine's shared md5-prefix hash
 * ([[TextDedup.strHash]]), and candidate pairs meet through the same
 * inverted-index + document-frequency-cap shape as
 * [[TextDedup.ngramJaccardPairs]] — a window occurring in more than
 * `maxPostings` documents is boilerplate (cookie banners, licence
 * headers) and is dropped from PAIRING (the df cap bounds the self-join
 * fan-out at corpus scale; at 100 TB the hot keys are exactly these).
 * Hash matches are verified against the window STRINGS before any pair
 * is reported, so output is exact, not probabilistic.
 *
 * Output: one row per (doc_a < doc_b) pair with the number of distinct
 * shared windows and the earliest shared position in doc_a — the span
 * evidence an excision pass (cut the duplicated run, keep the rest)
 * needs.
 */
object SubstringDedup {

  /**
   * Pairs of documents sharing ≥ 1 exact `windowTokens`-token run.
   * `stride` > 1 subsamples EMITTED positions on both sides (linear cost
   * reduction, trades recall: a shared run is found only if it covers
   * aligned windows on both documents — keep 1 for exactness, raise it
   * for triage at scale).
   */
  def windowPairs(docs: DataFrame, textCol: String, idCol: String,
      windowTokens: Int = 20, stride: Int = 1,
      maxPostings: Long = 1000): DataFrame = {
    require(windowTokens >= 2 && stride >= 1)
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // windows come out of one codegen'd kernel pass per document
    // (token_windows); the md5-prefix hash is then a regular codegen'd
    // projection over the EXPLODED rows — building strings and hashing
    // inside array lambdas paid interpreted per-element cost instead
    def wins(d: DataFrame, withWin: Boolean): DataFrame = {
      val w = d.select(col("doc_id"), posexplode(
        graft.functions.GraftFunctions.token_windows(col("text"),
          windowTokens, stride)).as(Seq("i", "win")))
        .select(col("doc_id"), (col("i").cast("long") * stride).as("pos"),
          col("win"))
        .withColumn("h", TextDedup.strHash(col("win")))
      if (withWin) w else w.drop("win")
    }

    // Candidates-first (the LSH-family shape): pairing runs entirely on
    // HASH-ONLY postings — 8-byte keys, no string payload through the
    // corpus-wide shuffles. Postings are first capped to ONE row per
    // (doc, h) — the min position — because a single shared hash already
    // establishes the candidate pair; without this cap two spammy
    // documents each repeating the same window k times put O(k²) rows
    // through the self-join for ONE hash, a fan-out the document-
    // frequency cap (which counts docs, not positions) never bounds.
    // The full window strings are re-derived (one more kernel pass) only
    // for documents that appear in a candidate pair, which on a
    // near-dup-sparse corpus is output-proportional, and the exact
    // string verify runs on that bounded set — also at distinct-window
    // grain, so the per-pair verify is |distinct shared windows|, not
    // |position combinations|. The explosion itself is deliberately
    // recomputed, not Materialized: it is token-grain, and checkpointing
    // it at corpus scale costs more than the map-only kernel pass it
    // saves.
    val postings = wins(base, withWin = false)
      .groupBy("doc_id", "h").agg(min(col("pos")).as("pos"))
    // df cap on the HASH key (the join key): windows in > maxPostings
    // docs never pair. Distinct docs, not positions — a window repeated
    // WITHIN one template document must not evict it from pairing (and
    // after the per-(doc, h) cap, plain count IS the distinct-doc df).
    val keep = postings.groupBy("h")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxPostings)
      .select("h")
    val kept = postings.join(keep, "h")
    val cand = kept.select(col("h"), col("doc_id").as("doc_a"))
      .join(kept.select(col("h"), col("doc_id").as("doc_b")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))

    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    // Distinct windows per candidate doc (min position each), restricted
    // to df-kept hashes — capped hashes must not resurface in the
    // shared-window counts. Any doc pair this verify joins together
    // shares a kept hash, so it is necessarily a candidate pair already;
    // no join back to `cand` is needed.
    val candWins = wins(base.join(candDocs, Seq("doc_id"), "leftsemi"),
      withWin = true)
      .join(keep, Seq("h"), "leftsemi")
      .groupBy("doc_id", "h", "win").agg(min(col("pos")).as("pos"))
    val wa = candWins.select(col("doc_id").as("doc_a"),
      col("pos").as("pos_a"), col("h"), col("win").as("win_a"))
    val wb = candWins.select(col("doc_id").as("doc_b"), col("h"),
      col("win").as("win_b"))
    wa.join(wb, Seq("h"))
      .filter(col("doc_a") < col("doc_b") && col("win_a") === col("win_b"))
      .groupBy("doc_a", "doc_b")
      .agg(countDistinct(col("win_a")).as("n_shared_windows"),
        min(col("pos_a")).as("first_pos_a"))
  }
}
