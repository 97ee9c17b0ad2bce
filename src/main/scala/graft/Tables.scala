package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst predicate pushdown /
  * column pruning reach the file source (verify with
  * `.explain("formatted")` → `PushedFilters`, `ReadSchema`). At 100 TB
  * these become partitioned/bucketed tables; nothing downstream assumes
  * a single file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session configs every entry point (Verify/Bench/tests) must set
    * before reading the driver tables. `nanosAsLong` because
    * events.parquet carries TIMESTAMP(NANOS) which Spark 4 otherwise
    * rejects ([PARQUET_TYPE_ILLEGAL]); we then truncate ns→µs, which is
    * exactly DuckDB's `epoch_us(ts)`. */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // The default whole-stage-codegen class cache (100 entries) is
    // smaller than this library's query suite (46 queries × several
    // codegen stages each) — under it, every suite pass recompiles
    // evicted stages with janino DURING execution, adding multi-second
    // sporadic stalls (measured 2-6× wall-clock variance at sf0.1).
    "spark.sql.codegen.cache.maxEntries" -> "10000",
    // native graft expressions (dot_f64) — see graft.functions
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    // Honor the per-bucket sort order of bucketed tables (q10 / the
    // Bucketing helper): off by default because it is only sound when
    // every bucket is a single file — which writeBucketed guarantees
    // by pre-repartitioning on the bucket key (same Murmur3-pmod hash
    // as the bucket-file assignment). With it, a key-matched SMJ over
    // bucket-sorted tables carries neither Exchange nor Sort.
    "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts arrives as nanos-since-epoch LONG (see requiredConfs);
    * exposed as a true µs TimestampType so downstream window/ordering
    * logic is plain timestamp algebra. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // files written by other engines (e.g. DuckDB) often carry NTZ;
      // under the pinned UTC session the wall time is identical
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
