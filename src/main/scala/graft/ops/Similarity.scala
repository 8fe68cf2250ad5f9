package graft.ops

import graft.Q

/** Similarity search over embeddings (brute-force cosine top-k, LSH-bucketed
  * scale path) — filled in after the relational surface.
  */
object Similarity {
  val queries: Seq[Q] = Seq.empty
}
