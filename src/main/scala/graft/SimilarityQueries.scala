package graft

/** Similarity-search operators over the `embeddings` table. Filled in
  * incrementally. */
object SimilarityQueries {
  import Registry.Q
  val all: Seq[Q] = Seq()
}
