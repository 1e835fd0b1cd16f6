package graft.dedup

import org.apache.spark.SparkFiles
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/**
 * Distribution story for benchmark Bloom filters, mirroring
 * [[graft.text.VocabRegistry]]: the `bloom_might_contain` prefilter
 * runs as a codegen'd `StaticInvoke`, which can carry only
 * column/literal arguments — no closures, so a `Broadcast[BloomFilter]`
 * handle cannot ride the expression. The serialized filter instead
 * ships like any Spark side file (`SparkContext.addFile` — the same
 * one-copy-per-executor economics as a broadcast variable), the kernel
 * carries just the registry NAME as a string literal, and each executor
 * JVM lazily deserializes its local copy on first use and memoizes it
 * here — one parse per JVM, shared by all tasks. In local mode the
 * driver's registered instance is already the memoized entry.
 */
object BloomRegistry {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, BloomFilter]()

  /** Driver-side construction metadata (e.g. "n=3" for a shingle
    * sketch): lets consumers fail fast on a parameter mismatch instead
    * of silently filtering everything out (a 4-gram sketch queried
    * with 3-gram hashes matches nothing — and a Bloom miss is a DROP,
    * not an error). Driver-only by design: plans are built on the
    * driver, which is where register() ran. */
  private val meta =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Record/fetch construction metadata for a registered filter. */
  def putMeta(name: String, m: String): Unit = meta.put(name, m)
  def getMeta(name: String): Option[String] = Option(meta.get(name))

  /** Driver-side: serialize `bloom` under `name`, ship it to executors,
    * and memoize the live instance locally. Returns `name` for
    * `GraftFunctions.bloom_might_contain(lit(name), h)`.
    *
    * Names are unique per SparkContext: re-registering fails fast here
    * rather than letting `SparkContext.addFile` throw (or, worse,
    * silently leaving remote executor JVMs serving a stale memoized
    * filter while only the driver cache is replaced). */
  def register(spark: SparkSession, bloom: BloomFilter,
      name: String): String = {
    // Atomic claim: putIfAbsent (not containsKey-then-put) so two
    // concurrent register() calls for one name cannot both pass the
    // guard and leave the cache serving whichever filter ran last.
    require(cache.putIfAbsent(name, bloom) == null,
      s"Bloom filter '$name' is already registered in this JVM; " +
        "registry names are unique per SparkContext")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-bloom")
      val file = dir.resolve(name)
      val out = java.nio.file.Files.newOutputStream(file)
      try bloom.writeTo(out) finally out.close()
      spark.sparkContext.addFile(file.toString)
    } catch { case e: Throwable => cache.remove(name, bloom); throw e }
    name
  }

  /** Executor-side memoized resolve: the registered copy in this JVM,
    * or the SparkFiles-distributed copy on a remote executor. */
  def get(name: String): BloomFilter =
    cache.computeIfAbsent(name, { n =>
      val in = java.nio.file.Files.newInputStream(
        java.nio.file.Paths.get(SparkFiles.get(n)))
      try BloomFilter.readFrom(in) finally in.close()
    })
}
