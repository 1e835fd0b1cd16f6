package graft

import graft.text.{Tokenizer, VocabRegistry}
import org.apache.spark.sql.functions._

/** Round-5 verdict #6: the wordpiece tokenizer must work against a
  * REAL-SIZED, file-loaded vocabulary (the compile-time DemoVocab
  * stays the default and the oracle's). */
class VocabRegistrySpec extends SparkSpec {
  import spark.implicits._

  /** ~30k-entry synthetic vocab.txt in the standard layout: specials,
    * single-char fallbacks, a real multi-piece split ("tokeniz" +
    * "##ation") that DemoVocab does NOT contain, and ~30k generated
    * word-start/continuation pieces. */
  private lazy val vocabPath: String = {
    val f = java.nio.file.Files.createTempFile("graft-vocab", ".txt")
    val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val gen = (0 until 14500).flatMap { i =>
      Seq(s"word$i", s"##suf$i")
    }
    val pieces = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "", "tokeniz",
      "##ation", "spark", "stream", "##ing") ++
      chars ++ chars.map("##" + _) ++ gen
    java.nio.file.Files.write(f, pieces.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("loadVocab parses ~30k pieces into length-bucketed tables") {
    val v = Tokenizer.loadVocab(java.nio.file.Paths.get(vocabPath))
    assert(v.pieces.size > 29000)
    // specials and blanks dropped
    assert(!v.pieces.contains("[CLS]") && !v.pieces.contains(""))
    // greedy match against the big vocab: a split DemoVocab cannot make
    assert(Tokenizer.tokenize("Tokenization", v).toSeq ==
      Seq("tokeniz", "##ation"))
    // "streaming": full word "stream" + ##ing
    assert(Tokenizer.tokenize("streaming", v).toSeq ==
      Seq("stream", "##ing"))
  }

  test("registered vocab drives the codegen'd kernel, matching the JVM tokenizer") {
    val name = VocabRegistry.register(spark, vocabPath)
    val v = Tokenizer.loadVocab(java.nio.file.Paths.get(vocabPath))
    val docs = Seq((1L, "Spark streaming tokenization"),
      (2L, "word42 suffixless"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        graft.functions.GraftFunctions.wordpiece_tokens(col("text"), name)
          .as("toks"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toSeq)).toMap
    assert(got(1L) == Tokenizer.tokenize("Spark streaming tokenization", v).toSeq)
    assert(got(1L).take(2) == Seq("spark", "stream"))
    assert(got(2L) == Tokenizer.tokenize("word42 suffixless", v).toSeq)
    assert(got(3L) == null) // propagateNull
  }

  test("default DemoVocab path is untouched by registering file vocabs") {
    VocabRegistry.register(spark, vocabPath)
    val df = Seq((1L, "customer window")).toDF("doc_id", "text")
    val toks = df.select(
        graft.functions.GraftFunctions.wordpiece_tokens(col("text")).as("t"))
      .head().getSeq[String](0).toSeq
    assert(toks == Seq("cust", "##omer", "win", "##dow"))
  }
}
