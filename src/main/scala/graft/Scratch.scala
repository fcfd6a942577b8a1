package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession

/** Per-process scratch directories for queries that round-trip through
  * a filesystem sink (bucketed copies, ORC/JSON/CSV round trips,
  * partitioned copies, streaming sinks).
  *
  * Keyed by `applicationId` so two concurrent JVMs on the same machine
  * (e.g. `sbt test` alongside a driver run) never `mode(Overwrite)` the
  * same directory — a race that could hand the read-back side of a
  * round-trip query corrupt or partial results (round-2 advisor
  * finding). Within one application the path is stable, so
  * once-per-session caches (bucketed table copies, IVF indexes) still
  * amortize across a bench's min-of-2 runs.
  *
  * Because the key is per-application, no later run ever overwrites a
  * predecessor's directory — so each application's subtree is deleted
  * on JVM exit (a shutdown hook per (group, appId)); otherwise repeated
  * test/bench runs would fill tmpdir with abandoned table copies.
  */
object Scratch {

  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def dir(s: SparkSession, group: String, tag: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    val appRoot = s"$tmp/$group/${s.sparkContext.applicationId}"
    if (cleanupRegistered.add(appRoot)) {
      sys.addShutdownHook(deleteRecursively(Paths.get(appRoot)))
    }
    s"$appRoot/$tag"
  }

  /** Run `body` once per scratch `dir` lifetime: a `_DONE` marker file
    * records completion, so re-invocations (the same query verified at
    * several SFs, bench min-of-2 runs) skip the materialization. The
    * marker is written only AFTER `body` returns — a partial write
    * (exception mid-body) leaves no marker and is redone, not read.
    * ONE definition for every materialize-once fixture (m04 binary
    * files, q89 avro files), so the guard can't drift per call site. */
  def materializeOnce(dir: String)(body: => Unit): Unit = {
    val done = Paths.get(dir, "_DONE")
    if (!Files.exists(done)) {
      Files.createDirectories(Paths.get(dir))
      body
      Files.createFile(done)
    }
  }

  /** Recursive delete for callers that retire a scratch subtree early
    * (e.g. a per-invocation streaming checkpoint that would otherwise
    * accumulate for the session lifetime). No-op on a missing path. */
  def deleteTree(path: String): Unit = deleteRecursively(Paths.get(path))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally walk.close()
    }
}
