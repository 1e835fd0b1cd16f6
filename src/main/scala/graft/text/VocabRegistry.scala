package graft.text

import org.apache.spark.SparkFiles
import org.apache.spark.sql.SparkSession

/**
 * Distribution story for FILE-LOADED wordpiece vocabularies (the
 * compile-time [[Tokenizer.DemoVocab]] literal stays the default — and
 * the oracle's — vocabulary; a production pipeline loads a ~30k-entry
 * `vocab.txt` instead).
 *
 * The tokenizer kernel runs as a codegen'd `StaticInvoke`, which can
 * carry only column/literal arguments — no closures, so a
 * `Broadcast[Vocab]` handle cannot ride the expression. Instead the
 * vocab travels the way Spark distributes side FILES:
 * `SparkContext.addFile` ships it to every executor (the same
 * one-copy-per-executor economics as a broadcast variable), the kernel
 * carries just the vocab NAME as a string literal, and each executor
 * JVM lazily parses its local copy ON FIRST USE and memoizes it here —
 * one parse per JVM, shared by all tasks, O(1) lookups thereafter.
 * In local mode driver and executor share the JVM, so the parse done
 * at registration time is already the memoized entry.
 */
object VocabRegistry {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Tokenizer.Vocab]()

  /** Driver-side: ship `path` to executors and return the registry
    * name (the file's base name) to pass to
    * `GraftFunctions.wordpiece_tokens(text, name)`. */
  def register(spark: SparkSession, path: String): String = {
    val file = new java.io.File(path)
    require(file.isFile, s"vocab file not found: $path")
    val name = file.getName
    spark.sparkContext.addFile(path)
    cache.put(name, Tokenizer.loadVocab(file.toPath))
    name
  }

  /** Executor-side memoized resolve: the registered copy in this JVM,
    * or the SparkFiles-distributed copy on a remote executor. */
  def get(name: String): Tokenizer.Vocab =
    cache.computeIfAbsent(name, n =>
      Tokenizer.loadVocab(java.nio.file.Paths.get(SparkFiles.get(n))))
}
