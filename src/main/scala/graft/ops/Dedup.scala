package graft.ops

import graft.Q

/** Deduplication operators (exact, MinHash/LSH, SimHash, n-gram Jaccard,
  * embedding near-dup) — filled in after the relational surface.
  */
object Dedup {
  val queries: Seq[Q] = Seq.empty
}
