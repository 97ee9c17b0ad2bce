package graft.operators

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode}

/** Bucketed-layout helper: the co-located-join primitive for the
  * 100 TB deployment (SURVEY §4 scale notes). Joins and aggregations
  * whose key matches the bucket spec read pre-shuffled data — the
  * exchange disappears from the plan entirely (asserted in
  * `BucketingSpec`), which at corpus scale is the difference between
  * a join that moves 100 TB and one that moves nothing.
  *
  * Spark's bucketing ties to the session catalog (`saveAsTable`), so
  * the driver's plain-parquet test tables cannot arrive bucketed —
  * this is the utility a deployment calls once per fact table at
  * ingest, trading one write-side shuffle for exchange-free reads on
  * every downstream join/agg keyed by `keys`.
  */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) external table.
    * `buckets` should track data volume: partitions of a bucketed
    * read are buckets, so size them like shuffle partitions
    * (fit-in-executor-memory at the target SF).
    *
    * The pre-write `repartition(buckets, keys)` matters: Spark's
    * repartition and its bucket-file assignment use the same
    * Murmur3-pmod hash, so after it each write task holds exactly one
    * bucket and every bucket lands in ONE file — the layout invariant
    * that lets the scan report per-bucket sort order (see
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` in
    * `Tables.requiredConfs`; with multi-file buckets that claim would
    * be wrong, which is why Spark defaults it off). This is the
    * "one write-side shuffle" the layout trades for exchange-free,
    * sort-free reads on every downstream key-matched join/agg. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      buckets: Int,
      keys: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    val w: DataFrameWriter[Row] = df
      .repartition(buckets, keys.map(col): _*)
      .write
      .mode(mode)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    w.saveAsTable(table)
  }
}
