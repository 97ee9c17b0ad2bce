package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: demonstrates the LSH band-width sizing law
  * (Similarity.withSig scaladoc: candidates ≈ N²·bands/2^(bandBits+1))
  * on a corpus REPLICA_FACTOR× the sf0.1 embeddings table, instead of
  * asserting it from a docstring. Round-1 finding being demonstrated:
  * the 4-bit gate geometry (16 buckets/band) stops completing around
  * 40k vectors, while 8/16-bit bands keep candidate sets — and thus
  * the verify join — bounded. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleProbe"
  *
  * Prints one line per geometry: bandBits, bucket count, candidate
  * pairs, elapsed seconds. The replica (exact copies with shifted ids)
  * is the worst realistic case for near-dup blocking: every true
  * duplicate group has 20 members, so every bucket is dense and the
  * candidate join cannot be saved by data sparsity.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_REPLICA", "20").toInt
    val out = "/tmp/graft_scale_probe"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config(Tables.requiredConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // id stride derives from the source ids — a hardcoded stride would
    // silently collide replica ids on larger corpora
    val stride = src.agg(max(col("vec_id"))).head.getLong(0) + 1L
    src.crossJoin(spark.range(factor).toDF("rep"))
      .withColumn("vec_id", col("vec_id") + col("rep") * lit(stride))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val n = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"corpus: $n vectors ($factor x $sfDir)")

    // (bits, bands, bandBits): the gate geometry (4-bit, sim2/sim3),
    // the sim3b wide-band gate (8-bit), and the next stop on the law
    // (16-bit). Same 32-plane pool throughout — only the knob moves.
    // SPARK_GRAFT_PROBE=dedup skips this (slow) section.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "all") != "dedup") {
      for ((bits, bands, bandBits) <- Seq((16, 4, 4), (32, 4, 8), (32, 2, 16))) {
        val t0 = System.nanoTime()
        val c = operators.Similarity.candidatePairs(spark, out, bits, bands, bandBits).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"bandBits=$bandBits%2d buckets=${1L << bandBits}%6d " +
          f"candidates=$c%12d elapsed=$secs%7.1f s")
      }
    }

    // Dedup sketch probe on a factor× documents replica (every doc in
    // a 20-dense exact-duplicate group — the worst case for band
    // buckets): runs the REAL dd3/dd4 gate pipelines (one-pass sketch
    // expressions + bucket-group pair generation) through the public
    // registry and reports verified pair counts + wall time.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "all") != "lsh") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val dstride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
      docs.crossJoin(spark.range(factor).toDF("rep"))
        .withColumn("doc_id", col("doc_id") + col("rep") * lit(dstride))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val nd = spark.read.parquet(s"$out/documents.parquet").count()
      println(s"corpus: $nd documents ($factor x $sfDir)")
      for (g <- Seq("dd4_simhash", "dd3_minhash_lsh")) {
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(g)(spark, out).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"$g%-16s pairs=$c%12d elapsed=$secs%7.1f s")
      }
      // Decontamination at 20×: the benchmark side (doc_id ≡ 0 mod 50 —
      // 2% of the corpus) stays broadcastable while the corpus side
      // scans without shuffling; flagged-pair volume is bounded by
      // actual overlap, not corpus size.
      locally {
        val t0 = System.nanoTime()
        val c = SparkEntry.queries("dd7_contamination")(spark, out).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"dd7_contamination flagged=$c%10d elapsed=$secs%7.1f s")
      }
      // Cluster resolution over the replica's pair graph: every doc
      // sits in a factor-dense duplicate CLIQUE, so the label
      // propagation should converge in ~2 rounds regardless of corpus
      // size (clique diameter is 1) — the scale property that makes
      // min-label CC viable at 100 TB for dedup graphs specifically.
      val t0 = System.nanoTime()
      val cl = SparkEntry.queries("dd6_dup_clusters")(spark, out)
        .agg(count(lit(1)).as("verts"),
          countDistinct(col("cluster_id")).as("clusters"),
          max(col("cluster_size")).as("max_size")).head
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"dd6_dup_clusters verts=${cl.getLong(0)}%9d clusters=${cl.getLong(1)}%7d " +
        f"max_size=${cl.getLong(2)}%5d elapsed=$secs%7.1f s")
    }
    spark.stop()
  }
}
