package graft

import org.apache.spark.sql.SparkSession

/** Per-process scratch directories for queries that round-trip through
  * a filesystem sink (bucketed copies, ORC/JSON round trips, streaming
  * sinks).
  *
  * Keyed by `applicationId` so two concurrent JVMs on the same machine
  * (e.g. `sbt test` alongside a driver run) never `mode(Overwrite)` the
  * same directory — a race that could hand the read-back side of a
  * round-trip query corrupt or partial results (round-2 advisor
  * finding). Within one application the path is stable, so
  * once-per-session caches (bucketed table copies, IVF indexes) still
  * amortize across a bench's min-of-2 runs.
  */
object Scratch {
  def dir(s: SparkSession, group: String, tag: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    s"$tmp/$group/${s.sparkContext.applicationId}/$tag"
  }
}
