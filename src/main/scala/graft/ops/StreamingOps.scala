package graft.ops

import graft.Q

/** Structured Streaming surface (SURVEY.md §2 Part C) — tumbling/sliding/
  * session windows, watermark, stateful dedup. Batch-equivalence is tested
  * in ScalaTest; filled in after the relational surface.
  */
object StreamingOps {
  val queries: Seq[Q] = Seq.empty
}
