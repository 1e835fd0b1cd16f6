package graft

import graft.dedup.BloomRegistry
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

class BloomRegistrySpec extends SparkSpec {

  test("registered filter answers bloom_might_contain with no false negatives") {
    import spark.implicits._
    val bloom = BloomFilter.create(1000, 0.01)
    (0L until 100L).foreach(i => bloom.putLong(i * 7L))
    val name = BloomRegistry.register(spark, bloom, "spec-bloom")

    val probed = (0L until 200L).toDF("k")
      .withColumn("hit",
        GraftFunctions.bloom_might_contain(lit(name), col("k") * 7L))
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    // Bloom contract: zero false negatives on the inserted keys...
    assert((0L until 100L).forall(probed(_)), "false negative")
    // ...and at 1% target FPP the non-members are overwhelmingly misses.
    val fp = (100L until 200L).count(probed(_))
    assert(fp < 20, s"implausible false-positive count $fp/100")
  }

  test("executor-side resolve memoizes: same live instance on repeat get") {
    val bloom = BloomFilter.create(100, 0.01)
    bloom.putLong(42L)
    BloomRegistry.register(spark, bloom, "spec-bloom-memo")
    // Local mode: the registered driver instance IS the memoized entry,
    // so get() must return it without touching SparkFiles.
    assert(BloomRegistry.get("spec-bloom-memo") eq bloom)
    assert(BloomRegistry.get("spec-bloom-memo") eq BloomRegistry.get("spec-bloom-memo"))
  }

  test("re-registering a name fails fast instead of going stale on executors") {
    val bloom = BloomFilter.create(100, 0.01)
    BloomRegistry.register(spark, bloom, "spec-bloom-dup")
    val ex = intercept[IllegalArgumentException] {
      BloomRegistry.register(spark, BloomFilter.create(100, 0.01),
        "spec-bloom-dup")
    }
    assert(ex.getMessage.contains("already registered"))
    // the original registration is untouched
    assert(BloomRegistry.get("spec-bloom-dup") eq bloom)
  }
}
