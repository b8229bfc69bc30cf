package graft

import org.apache.spark.sql.functions._

/** Text-analysis + dedup operators over the `documents` table
  * (LLM-data-pipeline surface; SURVEY.md §2.6). Filled in incrementally. */
object TextQueries {
  import Registry.Q

  val all: Seq[Q] = Seq(
    // Exact dedup by content hash (sha256) — the groupBy form scales:
    // one shuffle on the 64-hex digest, min(doc_id) is the canonical keeper.
    Q("q30_dedup_exact",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        d.select(sha2(col("text"), 256).as("content_hash"), col("doc_id"))
          .groupBy(col("content_hash"))
          .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))
          .filter(col("n_copies") >= 1)
      },
      Some("""SELECT sha256(text) AS content_hash, COUNT(*) AS n_copies,
             |CAST(MIN(doc_id) AS BIGINT) AS keeper_id
             |FROM documents GROUP BY sha256(text) HAVING COUNT(*) >= 1""".stripMargin)),
  )
}
