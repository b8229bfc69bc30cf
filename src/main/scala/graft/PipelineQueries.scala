package graft

/** Snapshot-pipeline parity operators (scan → anti-join → decrypt →
  * decompress → parse → deliver; SURVEY.md §2.1-2.5). Filled in
  * incrementally. */
object PipelineQueries {
  import Registry.Q
  val all: Seq[Q] = Seq()
}
