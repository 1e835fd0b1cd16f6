package graft

import graft.corpus.Curation
import org.apache.spark.sql.functions._

/** URL/domain curation: blocklist drop, suffix gate, per-domain cap
  * determinism — planted-violation coverage for each rule. */
class CurationSpec extends SparkSpec {

  private def rows = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "https://www.keep.example.com/a"),
      (2L, "https://blocked.example.com/x"), // blocklisted (no www)
      (3L, "https://www.BLOCKED.example.com/y"), // case-folds to blocked
      (4L, "https://other.example.org/z"), // wrong suffix
      (5L, "not a url"), // extractDomain -> ""
      (6L, "https://keep.example.com/b?q=1") // same domain as 1 (www-strip)
    ).toDF("doc_id", "url")
  }

  test("domainFilter: blocklist drops (case-insensitive, www-stripped), suffix gates") {
    val kept = Curation.domainFilter(rows, "url",
      blocked = Seq("blocked.example.com"),
      keepSuffix = Some(".example.com"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 2 and 3 blocklisted; 4 wrong suffix; 5 not URL-shaped ("" fails
    // the suffix gate); 1 and 6 survive
    assert(kept === Set(1L, 6L))
    // no suffix gate: only the blocklist applies
    val noSuffix = Curation.domainFilter(rows, "url",
      blocked = Seq("blocked.example.com"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(noSuffix === Set(1L, 4L, 5L, 6L))
  }

  test("capPerDomain: cap bites per domain, selection is a pure function of keys") {
    val s = spark
    import s.implicits._
    // domain a: 5 docs, domain b: 2 docs, domain c: 1 doc
    val many = ((1L to 5L).map(i => (i, "https://a.ex.com/" + i)) ++
      Seq((10L, "https://b.ex.com/1"), (11L, "https://b.ex.com/2"),
        (20L, "https://c.ex.com/1"))).toDF("doc_id", "url")
    val capped = Curation.capPerDomain(many, "url", "doc_id", cap = 2)
    val byDomain = capped.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain === Map("a.ex.com" -> 2L, "b.ex.com" -> 2L,
      "c.ex.com" -> 1L))
    // determinism under repartitioning (md5-rank total order)
    val a = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.capPerDomain(many.repartition(7), "url", "doc_id",
      cap = 2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // the selected two of domain a are exactly the two smallest md5
    // buckets (ties by key) — replay the rank driver-side
    def bucket(id: Long): (Long, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 10000, id)
    }
    val expectA = (1L to 5L).sortBy(bucket).take(2).toSet
    assert(a.filter(_ <= 5L) === expectA)
  }

  test("capPerDomain rejects non-positive caps") {
    intercept[IllegalArgumentException] {
      Curation.capPerDomain(rows, "url", "doc_id", cap = 0)
    }
  }
}
