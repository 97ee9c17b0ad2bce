package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-gate runner: `runMain graft.GateRun <gate>[,<gate>...]
  * [sfDir]`. Runs each named gate against the sf dir (default sf0.01),
  * prints its row count and wall time. Handy for verifying one gate's
  * behavior (plans, warnings, latency) without the full Bench suite. */
object GateRun {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GateRun <gate>[,<gate>...] [sfDir]")
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown gate '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[gaterun] $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
