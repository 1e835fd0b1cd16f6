package graft

import graft.operators.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranks (two-pass bucketed ranking) must be bit-identical to the
  * single-partition window formulation it replaces — asserted here
  * directly against percent_rank/cume_dist/ntile windows on seeded
  * random data including ties-in-value, tiny groups, and n < k. */
class RanksSpec extends SparkSpec {

  private def windowTruth(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    df.select(col("id"), col("g"),
      round(percent_rank().over(w), 6).as("pr"),
      round(cume_dist().over(w), 6).as("cd"),
      ntile(k).over(w).cast("int").as("quartile"))
  }

  test("bucketed rank equals the window formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // duplicate v values across rows force real tie-breaking by id;
    // group sizes vary from 1 to ~300
    val rows = (1L to 700L).map { id =>
      val g = if (id <= 300) "a" else if (id <= 600) "b"
              else if (id <= 699) "c" else "solo"
      (id, g, rnd.nextInt(40).toDouble)
    }
    val df = rows.toDF("id", "g", "v")
    val got = Ranks.percentiles(df, "g", "v", Seq("id"),
        floor(col("v") / 7), 4)
      .select("id", "g", "pr", "cd", "quartile")
    val want = windowTruth(df, 4)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("n < k: each row its own tile; single-row group has pr 0, cd 1") {
    import spark.implicits._
    val df = Seq((1L, "x", 5.0), (2L, "x", 3.0), (3L, "y", 1.0))
      .toDF("id", "g", "v")
    val got = Ranks.percentiles(df, "g", "v", Seq("id"), col("v"), 4)
      .select("id", "g", "pr", "cd", "quartile")
    val want = windowTruth(df, 4)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    val solo = got.filter(col("id") === 3).head()
    assert(solo.getAs[Double]("pr") == 0.0 && solo.getAs[Double]("cd") == 1.0)
  }

  test("bucket granularity does not change results (1 bucket vs per-value)") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, "g", (i % 9).toDouble)).toDF("id", "g", "v")
    val coarse = Ranks.percentiles(df, "g", "v", Seq("id"), lit(0L), 3)
      .select("id", "pr", "cd", "quartile")
    val fine = Ranks.percentiles(df, "g", "v", Seq("id"), col("v"), 3)
      .select("id", "pr", "cd", "quartile")
    assert(coarse.except(fine).isEmpty && fine.except(coarse).isEmpty)
  }
}
