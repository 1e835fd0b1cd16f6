package graft

import graft.io.JdbcSink

import java.sql.DriverManager

/** Batched JDBC upsert sink against embedded Derby (the dialect template
  * pattern; Postgres deployments swap the SQL). */
class JdbcSinkSpec extends SparkSpec {

  // Unique per-instantiation DB name: suites run concurrently in the
  // forked test JVM (sbt parallelExecution default), and Derby
  // in-memory databases live for the JVM lifetime — a fixed name means
  // any second use of "graftdb" (re-instantiated suite, leftover state
  // from an aborted run) hits CREATE TABLE collisions.
  private val url = {
    val db = "graftdb_" + java.util.UUID.randomUUID().toString.take(8)
    s"jdbc:derby:memory:$db;create=true"
  }

  private def query(sql: String): Seq[Seq[Any]] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val out = scala.collection.mutable.ListBuffer.empty[Seq[Any]]
      while (rs.next()) out += (1 to n).map(rs.getObject)
      out.toList
    } finally conn.close()
  }

  test("upsert merge: insert new keys, update existing, batched, idempotent") {
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE companies (abn VARCHAR(11) PRIMARY KEY, name VARCHAR(200), state VARCHAR(3))")
    conn.close()

    import spark.implicits._
    val batch1 = Seq(
      ("51824753556", "ACME", "NSW"),
      ("12345678901", "TechCorp", "VIC")).toDF("abn", "name", "state")
    val (sql, order) = JdbcSink.mergeTemplate("companies", "abn",
      Seq("abn", "name", "state"))
    JdbcSink.writeBatched(batch1, url, sql, order, batchSize = 1)
    assert(query("SELECT COUNT(*) FROM companies").head.head === 2)

    // second batch: one update, one insert
    val batch2 = Seq(
      ("51824753556", "ACME Holdings", "QLD"),
      ("98765432109", "Green Energy", "SA")).toDF("abn", "name", "state")
    JdbcSink.writeBatched(batch2, url, sql, order)
    val rows = query("SELECT abn, name, state FROM companies ORDER BY abn")
    assert(rows === Seq(
      Seq("12345678901", "TechCorp", "VIC"),
      Seq("51824753556", "ACME Holdings", "QLD"),
      Seq("98765432109", "Green Energy", "SA")))

    // idempotent: re-running the same batch changes nothing
    JdbcSink.writeBatched(batch2, url, sql, order)
    assert(query("SELECT COUNT(*) FROM companies").head.head === 3)
  }
}
