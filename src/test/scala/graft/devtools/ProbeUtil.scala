package graft

/** Shared plumbing for the devtools probes. */
object ProbeUtil {

  /** Best-effort recursive delete of a probe's scratch directory.
    * Materializes each listing BEFORE deleting (mutating under a live
    * `Files.list` stream is unspecified) and CLOSES the stream (it
    * holds an open directory handle until GC otherwise).
    */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      val children =
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toList
        } finally s.close()
      children.foreach(deleteRecursively)
    }
    java.nio.file.Files.deleteIfExists(p)
  }
}
