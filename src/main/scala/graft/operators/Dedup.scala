package graft.operators

import graft.GateQuery

/** Dedup operators: exact, minhash-LSH, simhash, n-gram Jaccard,
  * embedding near-dup (SURVEY §7.5). */
object Dedup {
  def queries: Seq[GateQuery] = Seq.empty
}
