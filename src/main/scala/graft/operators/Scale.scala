package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scale-out join helpers: the two standard answers to the shuffle
 * problems a 100 TB workload hits that sf0.1 never shows.
 *
 * - [[Salt.join]]: a skewed equi-join key (a handful of hot values
 *   holding most rows) makes one reducer partition take the whole stage's
 *   wall clock. Salting splits each hot key into `buckets` sub-keys on
 *   the big side and replicates the small side across them — an explicit,
 *   planner-independent alternative to AQE's skew-join split (which only
 *   kicks in for sort-merge joins past size thresholds).
 * - [[Bucketing]]: pre-bucketed tables joined on the bucket key need no
 *   exchange at read time; for iterated joins against a 100 TB fact
 *   table (the IVF corpus-by-cluster layout, the entity-match ABR side)
 *   this moves the shuffle to write time, once.
 */
object Salt {

  /**
   * Inner equi-join with the big (skewed) side salted into `buckets`
   * sub-keys. The salt is derived deterministically from the big side's
   * whole row, so rows of one hot key spread across buckets; the small
   * side is replicated buckets×. Result set equals the plain join.
   */
  def join(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}

object Bucketing {

  /** Write a frame as a bucketed (+ optionally sorted) table. Joins and
    * aggregations on the bucket columns then read shuffle-free. */
  def writeBucketed(df: DataFrame, tableName: String, numBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).format("parquet").saveAsTable(tableName)
  }
}
