package graft

import org.apache.spark.sql.SparkSession

/** Shared session bootstrap for the driver-contract mains (Verify,
  * VerifySubset, GateRun). Defaults to `local[cpus]`; two env knobs
  * exist for the DISTRIBUTION smoke:
  *
  *   - `SPARK_GRAFT_MASTER=local-cluster[2,2,2048]` runs the same
  *     gates against separate executor JVMs, so any same-JVM
  *     assumption (a static map an executor mutates, driver-side
  *     state executors can't see) breaks loudly instead of silently
  *     passing in local mode. Requires SPARK_HOME (the worker
  *     launches executor processes from the distribution).
  *   - `SPARK_GRAFT_JARS=<path.jar>` ships the packaged gate classes
  *     to those executor processes (`sbt package` output).
  *
  * See README "local-cluster distribution smoke" for the receipt.
  */
object GraftSession {
  def build(cpus: String): SparkSession = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(Tables.requiredConfs)
    val b1 = sys.env.get("SPARK_GRAFT_JARS").filter(_.nonEmpty)
      .fold(b0)(j => b0.config("spark.jars", j))
    val spark = b1.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
