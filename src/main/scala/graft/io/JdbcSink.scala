package graft.io

import org.apache.spark.sql.{DataFrame, Row}

import java.sql.{Connection, DriverManager, PreparedStatement}

/**
 * Batched JDBC upsert sink — the engine-side version of the reference's
 * four psycopg2 loaders (src/load/load_postgres.py:124-372: execute_batch
 * of 1000, append-ignore / upsert-by-key variants).
 *
 * Spark's built-in JDBC writer only appends/overwrites; upserts need a
 * per-partition statement loop. Each partition opens one connection and
 * executes `batchSize`-row batches of a caller-supplied SQL template —
 * the template carries the dialect (`INSERT ... ON CONFLICT` on Postgres,
 * `MERGE INTO` on Derby/SQL Server, `INSERT ... ON DUPLICATE KEY` on
 * MySQL), the sink carries the distribution.
 *
 * Scale notes: parallelism = number of partitions (repartition the frame
 * to size the connection pool the database can take — the reference's
 * single-connection driver loop loaded 2M rows in ~334 s, ~6 K rows/s;
 * partitioned loaders scale linearly until the DB write path saturates).
 * Batches are ordered within a partition; the template must be
 * idempotent (true upsert) so task retries are safe.
 *
 * EMBEDDED-Derby caveat: same-JVM connections executing MERGE batches
 * concurrently can deadlock INSIDE Derby's storage engine (page vs
 * container-handle monitors — a JVM-level deadlock jstack reports, not
 * a SQL lock timeout Derby can break; observed live between two
 * executor tasks). Embedded URLs therefore serialize partition batches
 * through a JVM-global lock: correctness-neutral (partitions were
 * unordered anyway), and the parallelism claim above is about REMOTE
 * databases, where each executor JVM talks to an external server and
 * the lock never spans JVMs. Client/server Derby (`jdbc:derby://…`)
 * is remote and unaffected.
 */
object JdbcSink {

  /** JVM-global mutex for embedded-Derby partition writes. */
  private object EmbeddedDerbyLock

  private def isEmbeddedDerby(url: String): Boolean =
    url.startsWith("jdbc:derby:") && !url.startsWith("jdbc:derby://")

  /**
   * Write `df` through `sql`. `colOrder` maps the statement's `?`
   * placeholders (in order) to column names of `df`; a column may repeat
   * when the template needs it more than once (MERGE match + update +
   * insert). Defaults to the frame's columns once each.
   */
  def writeBatched(df: DataFrame, url: String, sql: String,
      colOrder: Seq[String] = Nil, batchSize: Int = 1000,
      props: Map[String, String] = Map.empty): Unit = {
    val order = if (colOrder.nonEmpty) colOrder else df.columns.toSeq
    val idx = order.map(df.columns.indexOf(_))
    require(idx.forall(_ >= 0), s"unknown column in colOrder: $colOrder")
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        def run(): Unit = {
          val conn = connect(url, props)
          try {
            conn.setAutoCommit(false)
            val stmt = conn.prepareStatement(sql)
            try {
              var n = 0
              rows.foreach { r =>
                var p = 0
                while (p < idx.length) {
                  stmt.setObject(p + 1, r.get(idx(p)))
                  p += 1
                }
                stmt.addBatch()
                n += 1
                if (n % batchSize == 0) { stmt.executeBatch(); conn.commit() }
              }
              if (n % batchSize != 0) { stmt.executeBatch(); conn.commit() }
            } finally stmt.close()
          } finally conn.close()
        }
        if (isEmbeddedDerby(url)) EmbeddedDerbyLock.synchronized(run())
        else run()
      }
    }
  }

  private def connect(url: String, props: Map[String, String]): Connection = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    DriverManager.getConnection(url, p)
  }

  /** Derby/ANSI MERGE upsert template + its placeholder column order —
    * the shape used by the Derby-backed tests; Postgres deployments use
    * an `INSERT ... ON CONFLICT (key) DO UPDATE` template instead. */
  def mergeTemplate(table: String, keyCol: String,
      cols: Seq[String]): (String, Seq[String]) = {
    val nonKey = cols.filterNot(_ == keyCol)
    val sql =
      s"""MERGE INTO $table t
         |USING SYSIBM.SYSDUMMY1
         |ON t.$keyCol = ?
         |WHEN MATCHED THEN UPDATE SET ${nonKey.map(c => s"t.$c = ?").mkString(", ")}
         |WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin
    (sql, (keyCol +: nonKey) ++ cols)
  }
}
