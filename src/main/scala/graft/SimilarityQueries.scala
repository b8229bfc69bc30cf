package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Multimodal, Similarity}

/** Similarity-search + multimodal operators over `embeddings`/`documents`
  * (LLM-data-pipeline surface). Brute-force cosine top-k is the
  * oracle-checked baseline; SRP-LSH and IVF are the scale paths
  * (recall-tested against brute force in SimilaritySpec).
  */
object SimilarityQueries {
  import Registry.Q

  /** The q41 oracle's literal Rademacher matrix: sign(plane, dim) from the
    * SAME splitmix64 derivation as VectorFunctions.srpSignatureKernel
    * (±1.0 exactly representable — multiplying by it reproduces the
    * kernel's add/subtract bit-for-bit). */
  private def srpSignRows(planes: Int, dims: Int, seed: Long): String =
    (0 until planes).map { p =>
      val sv = (0 until dims).map { i =>
        val h = VectorFunctions.mix64(seed ^ VectorFunctions.mix64(p.toLong << 32 | i.toLong))
        if ((h & 1L) == 0L) "1.0" else "-1.0"
      }.mkString("[", ",", "]")
      s"($p, $sv)"
    }.mkString(",")

  val all: Seq[Q] = Seq(
    // Exact cosine top-5 neighbors for the first 20 vectors.
    Q("q40_cosine_brute_topk",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        Similarity.bruteTopK(e.filter(col("vec_id") < 20), e, 5)
      },
      Some("""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings WHERE vec_id < 20),
             |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
             |pairs AS (
             |  SELECT qid, nid,
             |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) *
             |      sqrt(list_dot_product(nv, nv))) AS sim
             |  FROM q JOIN c ON qid <> nid),
             |ranked AS (
             |  SELECT qid, nid, sim,
             |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
             |  FROM pairs)
             |SELECT qid, nid, ROUND(sim, 6) AS sim, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 5""".stripMargin)),

    // SRP-LSH approximate top-k (bucketed candidates only). Oracled: the
    // signature is deterministic given the seed, so the Rademacher plane
    // matrix is embedded in the SQL as a literal — generated from the
    // SAME mix64 the kernel uses (srpSignRows), so they cannot drift —
    // and DuckDB replays signature → band buckets → candidate join →
    // exact rerank. list_dot_product matches the fused kernel's ascending
    // double accumulation bit-exactly (proven by the q40 oracle).
    Q("q41_cosine_srp_topk",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        Similarity.srpTopK(e.filter(col("vec_id") < 20), e, 5)
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_results"),
            round(max(col("sim")), 6).as("best_sim"))
      },
      Some(s"""WITH signs AS (
             |  SELECT plane, CAST(sv AS DOUBLE[]) AS sv
             |  FROM (VALUES ${srpSignRows(planes = 16, dims = 64, seed = 42L)}) s(plane, sv)),
             |base AS (
             |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |normed AS (
             |  SELECT id, v, sqrt(list_dot_product(v, v)) AS vnorm FROM base
             |  WHERE sqrt(list_dot_product(v, v)) > 0),
             |accs AS (
             |  SELECT id, plane, list_dot_product(v, sv) AS acc
             |  FROM normed CROSS JOIN signs),
             |sigs AS (
             |  SELECT id,
             |    sum(CASE WHEN acc >= 0 THEN (CAST(1 AS BIGINT) << plane) ELSE 0 END) AS sig
             |  FROM accs GROUP BY id),
             |banded AS (
             |  SELECT id, band, (sig >> (band * 4)) & 15 AS bucket
             |  FROM sigs CROSS JOIN (VALUES (0),(1),(2),(3)) b(band)),
             |cand AS (
             |  SELECT DISTINCT q.id AS qid, c.id AS nid
             |  FROM banded q JOIN banded c ON q.band = c.band AND q.bucket = c.bucket
             |  WHERE q.id < 20 AND q.id <> c.id),
             |pairs AS (
             |  SELECT qid, nid,
             |    list_dot_product(qn.v, cn.v) / (qn.vnorm * cn.vnorm) AS sim
             |  FROM cand JOIN normed qn ON qn.id = qid JOIN normed cn ON cn.id = nid),
             |ranked AS (
             |  SELECT qid, nid, ROUND(sim, 6) AS sim,
             |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
             |  FROM pairs)
             |SELECT qid, count(*) AS n_results, ROUND(max(sim), 6) AS best_sim
             |FROM ranked WHERE rank <= 5 GROUP BY qid""".stripMargin)),

    // IVF (KMeans cells, nprobe probing) approximate top-k.
    Q("q42_cosine_ivf_topk",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        Similarity.ivfTopK(e.filter(col("vec_id") < 20), e, 5)
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_results"),
            round(max(col("sim")), 6).as("best_sim"))
      },
      None),

    // Vector statistics: norms per label (higher-order fns, no UDF).
    Q("q43_embedding_stats",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        e.groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            round(avg(VectorFunctions.norm(col("embedding"))), 6).as("avg_norm"),
            max(size(col("embedding"))).as("dim"))
      },
      Some("""SELECT label, COUNT(*) AS n,
             |ROUND(AVG(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
             |  CAST(embedding AS DOUBLE[])))), 6) AS avg_norm,
             |CAST(MAX(len(embedding)) AS INT) AS dim
             |FROM embeddings GROUP BY label""".stripMargin)),

    // Embedding near-duplicate pairs via SRP buckets, on a corpus doubled
    // with exact copies (shifted ids) so duplicates exist by construction.
    // Oracled like q41: the 24-plane Rademacher matrix is embedded from
    // the SAME splitmix64 derivation, buckets are plain 8-bit sig slices
    // (no engine-specific hashing anywhere on the candidate path), the
    // threshold is applied to the unrounded sim exactly as the operator
    // does, and only then rounded for output.
    Q("q44_embedding_neardup",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val doubledCorpus = e.unionByName(
          e.withColumn("vec_id", col("vec_id") + 10000L))
        Similarity.cosineDupPairs(doubledCorpus, 0.95)
          .agg(count(lit(1)).as("n_dup_pairs"),
            round(min(col("sim")), 6).as("min_sim"))
      },
      Some(s"""WITH signs AS (
             |  SELECT plane, CAST(sv AS DOUBLE[]) AS sv
             |  FROM (VALUES ${srpSignRows(planes = 24, dims = 64, seed = 42L)}) s(plane, sv)),
             |base AS (
             |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |  UNION ALL
             |  SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) FROM embeddings),
             |normed AS (
             |  SELECT id, v, sqrt(list_dot_product(v, v)) AS vnorm FROM base
             |  WHERE sqrt(list_dot_product(v, v)) > 0),
             |accs AS (
             |  SELECT id, plane, list_dot_product(v, sv) AS acc
             |  FROM normed CROSS JOIN signs),
             |sigs AS (
             |  SELECT id,
             |    sum(CASE WHEN acc >= 0 THEN (CAST(1 AS BIGINT) << plane) ELSE 0 END) AS sig
             |  FROM accs GROUP BY id),
             |banded AS (
             |  SELECT id, band, (sig >> (band * 8)) & 255 AS bucket
             |  FROM sigs CROSS JOIN (VALUES (0),(1),(2)) b(band)),
             |cand AS (
             |  SELECT DISTINCT a.id AS idA, b.id AS idB
             |  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
             |  WHERE a.id < b.id),
             |pairs AS (
             |  SELECT idA, idB,
             |    list_dot_product(na.v, nb.v) / (na.vnorm * nb.vnorm) AS sim
             |  FROM cand JOIN normed na ON na.id = idA JOIN normed nb ON nb.id = idB)
             |SELECT count(*) AS n_dup_pairs,
             |  round(min(round(sim, 6)), 6) AS min_sim
             |FROM pairs WHERE sim >= 0.95""".stripMargin)),

    // Product quantization: 64-dim float vectors → 8-int codes (32×
    // compression), ADC top-10 over the compressed index only.
    Q("q46_pq_adc_topk",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "embeddings")
        val model = graft.operators.ProductQuantization.train(e)
        val index = graft.operators.ProductQuantization.encode(e, model)
        graft.operators.ProductQuantization
          .adcTopK(e.filter(col("vec_id") < 20), index, model, 10)
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_results"),
            round(max(col("approx_dot")), 4).as("best_approx_dot"))
      },
      None), // KMeans codebooks are engine-specific; recall bounds in PQSpec

    // Multimodal plumbing: binary media column → per-partition decode
    // (stubbed kernel) → typed metadata + features → aggregate.
    Q("q45_multimodal_decode",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val decoded = Multimodal.decode(Multimodal.syntheticMedia(d))
        decoded.toDF()
          .groupBy(col("media_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("meta.bytes")).as("total_bytes"),
            round(avg(col("meta.width")), 4).as("avg_width"),
            round(sum(VectorFunctions.norm(col("features"))), 4).as("feat_norm_sum"))
      },
      None),

    // REAL container-header extraction (PNG IHDR / WAV fmt / MP4 ftyp
    // parsed from actual bytes — the pre-decode filter pass of a media
    // ingest). The builders put deterministic doc_id-derived values into
    // valid headers; the oracle recomputes those values in SQL, so a
    // parser byte-offset bug breaks the hash.
    Q("q98_media_headers",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        Multimodal.extractHeaders(Multimodal.headeredMedia(d))
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n"),
            sum(col("width")).as("width_sum"),
            sum(col("height")).as("height_sum"),
            sum(col("channels")).as("channels_sum"),
            sum(col("sample_rate")).as("rate_sum"),
            sum(col("payload_bytes")).as("payload_sum"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 0 THEN 'png'
             |      WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'isom' END AS format,
             |    CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 113 ELSE 0 END AS width,
             |    CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id // 7) % 97 ELSE 0 END AS height,
             |    CASE WHEN doc_id % 3 = 0 THEN 3
             |      WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2 ELSE 0 END AS channels,
             |    CASE WHEN doc_id % 3 = 1 THEN
             |      CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 16000 END
             |      ELSE 0 END AS sample_rate,
             |    strlen(coalesce(text, '')) AS payload_bytes
             |  FROM documents)
             |SELECT format, count(*) AS n,
             |  CAST(sum(width) AS BIGINT) AS width_sum,
             |  CAST(sum(height) AS BIGINT) AS height_sum,
             |  CAST(sum(channels) AS BIGINT) AS channels_sum,
             |  CAST(sum(sample_rate) AS BIGINT) AS rate_sum,
             |  CAST(sum(payload_bytes) AS BIGINT) AS payload_sum
             |FROM m GROUP BY format""".stripMargin)),
  )
}
