package graft.operators

import graft.GateQuery

/** Embedding similarity search: brute-force cosine top-k + LSH-bucketed
  * ANN (SURVEY §7.5). */
object Similarity {
  def queries: Seq[GateQuery] = Seq.empty
}
