package graft

import graft.operators.Merge
import org.apache.spark.sql.functions.col

/** S8 merge operators (reference: src/load/load_postgres.py:124-372,
  * src/load/upsert_logic.py:87-168). */
class MergeSpec extends SparkSpec {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private lazy val schema = StructType(Seq(
    StructField("k", StringType), StructField("a", StringType),
    StructField("b", StringType)))
  private def df(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      schema)

  private lazy val existing = df(("1", "old1", "x1"), ("2", "old2", "x2"))
  private lazy val incoming = df(("2", "new2", null), ("3", "new3", "x3"),
    ("3", "dup3", "ignored")) // duplicate key in batch: keep-first wins

  test("insertIfAbsent: ON CONFLICT DO NOTHING semantics") {
    val out = Merge.insertIfAbsent(existing, incoming, Seq("k"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("1", "old1"), ("2", "old2"), ("3", "dup3")))
  }

  test("upsert: whole-row replace, incoming nulls overwrite") {
    val out = Merge.upsert(existing, incoming, Seq("k")).orderBy("k")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq(("1", "old1", "x1"), ("2", "new2", null),
      ("3", "dup3", "ignored")))
  }

  test("patch: column-precedence, incoming nulls keep existing") {
    val out = Merge.patch(existing, incoming, Seq("k")).orderBy("k")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq(("1", "old1", "x1"), ("2", "new2", "x2"),
      ("3", "dup3", "ignored")))
  }

  test("patch: disjoint columns pass through") {
    val inc2 = df(("2", "new2", "y2")).withColumnRenamed("b", "c")
    val out = Merge.patch(existing, inc2, Seq("k"))
    assert(out.columns.toSeq === Seq("k", "a", "b", "c"))
    val r2 = out.filter(col("k") === "2").collect().head
    assert(r2.getAs[String]("b") === "x2" && r2.getAs[String]("c") === "y2")
    assert(out.filter(col("k") === "1").collect().head.getAs[String]("c") == null)
  }
}
