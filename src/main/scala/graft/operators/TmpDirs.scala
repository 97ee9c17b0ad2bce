package graft.operators

import org.apache.spark.sql.SparkSession

/** Scoped tmp-dir bracket for the MUTATING gates (file layout is the
  * layer under test: compaction, partition DROP, MERGE, time travel,
  * index maintenance...). Each gate stages under one unique root and
  * follows the write → materialize(collect) → delete discipline; this
  * helper moves the delete into a `finally` so a failed `require` or
  * collect can never leave poisoned parquet accumulating under
  * `java.io.tmpdir` across runs (round-9 advice). The success-path
  * deletes inside the gates stay — the finally is the backstop
  * (`FileSystem.delete` on a missing path is a no-op returning false).
  */
private[graft] object TmpDirs {

  /** Mint `java.io.tmpdir/graft_<tag>_<uuid>`, run `body` with the
    * path, recursively delete it on ALL exits. `body` must therefore
    * MATERIALIZE anything it reads from the dir before returning —
    * returning a lazy DataFrame over the root would read a deleted
    * directory at the caller's first action. */
  def withRoot[T](s: SparkSession, tag: String)(body: String => T): T = {
    val dir =
      s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${java.util.UUID.randomUUID()}"
    try body(dir)
    finally {
      // cleanup must never shadow the body's primary failure (e.g. the
      // SparkContext already stopped when the body threw) — best-effort
      try {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      } catch {
        case scala.util.control.NonFatal(_) =>
          exitRoots.add(new java.io.File(dir)) // retry at JVM exit
      }
    }
  }

  private val exitRoots = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val it = exitRoots.iterator()
      while (it.hasNext) deleteRec(it.next())
    }, "graft-tmpdirs-cleanup"))
  }
  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  /** For the one gate shape that must RETURN a lazy frame over its
    * staged files (la6: the spec pins partition pruning in the
    * returned plan, so the read-back cannot be collected away): the
    * dir lives until JVM exit (the StreamGates replay-root
    * discipline), then is reclaimed by the shutdown hook — still
    * never accumulating across runs. */
  def exitScopedRoot(tag: String): String = {
    val dir =
      s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${java.util.UUID.randomUUID()}"
    exitRoots.add(new java.io.File(dir))
    dir
  }
}
