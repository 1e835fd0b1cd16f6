package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/**
 * Randomized ENGINE-vs-ORACLE pretokenization parity (round-13 advice,
 * medium): the engine's GPT-2 pattern (Java lookahead) vs a faithful
 * Scala simulation of the DuckDB oracle's two-step rewrite
 * (lookahead-free extraction + the whitespace-donation list rewrite,
 * donation RE-TOKENIZED). The generator deliberately includes
 * contraction suffixes after multi-space runs — the case where the old
 * `' ' || x` concatenation produced the non-engine token ` 's`.
 *
 * The simulation's fidelity to real DuckDB is separately re-confirmed
 * by `tools/pretok_parity.py` over the fixture this spec writes to
 * `target/pretok_parity/` (engine stream + the oracle probe SQL), and
 * permanently by the oracle-gated `bpe_pretok_stream` query.
 */
class BpePretokOracleParitySpec extends SparkSpec {

  private val engineRe = Bpe.Gpt2Pretok.r

  /** The oracle's lookahead-free pattern, as built in [[Bpe]] (RE2 and
    * Java agree on it — no lookahead, explicit ASCII whitespace). */
  private val oracleRe =
    ("'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+" +
      "| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\x0B\\f\\r]+").r

  private def isWsRun(s: String): Boolean =
    s.nonEmpty && s.forall(c => c == ' ' || c == '\t' || c == '\n' ||
      c == '\u000B' || c == '\f' || c == '\r')

  private val contractions =
    Set("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
  private def isLetterRun(s: String): Boolean =
    s.nonEmpty && "^\\p{L}+$".r.matches(s)

  /** Scala twin of the DuckDB `oPretoks` list rewrite (1-based DuckDB
    * indexing translated to 0-based), including the contraction
    * re-tokenization and the one-token-further letter-run join. */
  private def simulatedOracle(text: String): Seq[String] = {
    val p0 = oracleRe.findAllIn(text).toVector
    def donatingRun(j: Int): Boolean =
      j >= 0 && isWsRun(p0(j)) && p0(j).length >= 2 && p0(j).last == ' '
    p0.zipWithIndex.flatMap { case (x, i) =>
      if (isWsRun(x) && x.length >= 2 && i < p0.length - 1) {
        if (x.last == ' ') Seq(x.dropRight(1))
        else Seq(x.dropRight(1), x.last.toString)
      } else if (i > 0 && donatingRun(i - 1)) {
        if (contractions(x) && i < p0.length - 1 && isLetterRun(p0(i + 1)))
          oracleRe.findAllIn(" " + x + p0(i + 1)).toVector
        else oracleRe.findAllIn(" " + x).toVector
      } else if (i > 1 && isLetterRun(x) && contractions(p0(i - 1)) &&
        donatingRun(i - 2)) {
        Seq.empty // consumed by the contraction join above
      } else Seq(x)
    }
  }

  private def engine(text: String): Seq[String] =
    engineRe.findAllIn(text).toVector

  private val atoms = Vector(
    "a", "bb", "Hello", "WORLD", "42", "7", "!", "?!", "...", ",",
    "'s", "'t", "'re", "'ve", "'m", "'ll", "'d", "'",
    " ", "  ", "   ", "    ", "\t", "\n", "\u000B", "\f", "\r",
    " \t", "\t ", "  \t", "\t  ", "é", "ñandú", "𝄞", "中文", ".", "-")

  test("randomized parity incl. contractions after multi-space runs (5000 cases)") {
    val rnd = new scala.util.Random(20260816L)
    var checked = 0
    for (_ <- 0 until 5000) {
      val n = rnd.nextInt(12)
      val text = (0 until n).map(_ => atoms(rnd.nextInt(atoms.length)))
        .mkString
      val e = engine(text)
      val o = simulatedOracle(text)
      assert(e == o, s"diverged on ${text.map(c => f"\\u${c.toInt}%04x").mkString}: engine=$e oracle=$o")
      // totality: every character lands in some pretoken
      assert(e.mkString == text)
      checked += 1
    }
    assert(checked == 5000)
  }

  test("the round-13 divergence cases specifically") {
    val cases = Seq(
      "a  's", "a  'll", "x   've", "a  'd b", "q    't",
      "a  \t's", "a \t 're", "end  ", "  'm", "a  'zzz",
      "a  '", "a  ''s", "multi   word  's test")
    for (t <- cases) {
      assert(engine(t) == simulatedOracle(t), s"'$t'")
    }
    // the exact advice example: engine [a][ ][ '][s]
    assert(engine("a  's") == Seq("a", " ", " '", "s"))
    assert(simulatedOracle("a  's") == Seq("a", " ", " '", "s"))
  }

  test("engine Column pretokens ≡ Java-regex engine reference on edge cases") {
    import spark.implicits._
    val cases = Seq("a  's", "a  \t're", "  'm", "tail  ",
      "mix 42  'll!", "é  's 𝄞")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Bpe.pretokens(col("text")).as("t"))
      .orderBy("doc_id").collect()
      .map(r => r.getSeq[String](1).toVector)
    cases.zip(got).foreach { case (t, g) => assert(g == engine(t), s"'$t'") }
  }

  test("write the DuckDB parity fixture for tools/pretok_parity.py") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    val texts = (0 until 400).map { _ =>
      val n = rnd.nextInt(12)
      (0 until n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    } ++ Seq("a  's", "a  'll", "x   've", "a  \t's", "  'm", "end  ")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val outDir = "target/pretok_parity"
    Bpe.pretokenStreamDf(df).orderBy("doc_id")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$outDir/engine_stream.parquet")
    df.repartition(1).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/probe.sql"),
      Bpe.oraclePretokenStreamSql.getBytes("UTF-8"))
    assert(new java.io.File(s"$outDir/probe.sql").isFile)
  }
}
