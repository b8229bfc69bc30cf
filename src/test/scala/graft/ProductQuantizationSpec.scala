package graft

import org.apache.spark.sql.functions._

import graft.operators.{ProductQuantization, Similarity}

class ProductQuantizationSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
  private lazy val model = ProductQuantization.train(emb)

  test("train on an empty / all-null corpus fails with an explicit message") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      ProductQuantization.train(empty)
    }
    assert(e1.getMessage.contains("no trainable vectors"))
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      ProductQuantization.train(allNull)
    }
    assert(e2.getMessage.contains("no trainable vectors"))
  }

  test("codes are m ints in [0, k); 32x smaller than the float vectors") {
    val index = ProductQuantization.encode(emb, model).cache()
    assert(index.count() == emb.count())
    val bad = index.filter(exists(col("code"),
      c => c < 0 || c >= 16)).count()
    assert(bad == 0)
    val m = index.select(size(col("code"))).head().getInt(0)
    assert(m == 8) // 8 bytes-worth of codes vs 64 floats = 32x
  }

  test("ADC top-10 recalls a substantial share of exact top-10") {
    val queries = emb.filter(col("vec_id") < 20)
    val index = ProductQuantization.encode(emb, model)
    val approx = ProductQuantization.adcTopK(queries, index, model, 10)
      .select(col("qid"), col("nid"))
    val exact = Similarity.bruteTopK(queries, emb, 10)
      .select(col("qid"), col("nid"))
    val hit = exact.join(approx, Seq("qid", "nid")).count().toDouble
    val recall = hit / exact.count()
    // 16-cell codebooks on random 64-dim data are coarse; chance level is
    // 10/499 ≈ 0.02 — require an order of magnitude above it
    assert(recall >= 0.2, s"recall@10 = $recall")
  }

  test("distributed corpus-vs-corpus IVF-ADC == driver-side ivfAdcTopK row-for-row") {
    // same queries, same corpus, same params: the distributed plan
    // (executor-side probes/tables, cell shuffle, bounded-heap top-k)
    // must reproduce the driver-side path exactly — scores, ranks, ties
    val queries = emb.filter(col("vec_id") < 30)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid", "approx_dot", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val driver = canon(ProductQuantization.ivfAdcTopK(queries, emb, 10))
    val dist = canon(ProductQuantization.ivfAdcTopKDistributed(queries, emb, 10))
    assert(dist == driver)
  }

  test("distributed IVF-ADC drops zero-norm and wrong-dim queries, keeps the rest") {
    val weird = Seq(
      (70001L, Seq.fill(64)(0f)),          // zero norm → dropped
      (70002L, Seq.fill(3)(1f)),           // wrong dim → dropped
      (70003L, (0 until 64).map(_.toFloat)) // fine
    ).toDF("vec_id", "embedding")
    val out = ProductQuantization.ivfAdcTopKDistributed(weird, emb, 5)
      .select("qid").distinct().as[Long].collect().toSet
    assert(out == Set(70003L))
  }

  test("an exact duplicate vector gets the identical code") {
    val dup = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(90000L))
    val index = ProductQuantization.encode(emb.unionByName(dup), model)
    val codes = index.filter(col("vec_id").isin(0L, 90000L))
      .select("code").as[Seq[Int]].collect()
    assert(codes.length == 2 && codes(0) == codes(1))
  }

  test("upsertAnnIndex refuses a base index built under a different fit; delete is an idempotent anti-join") {
    val epoch = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 =!= 0)
    val fit = ProductQuantization.fitFrozen(epoch)
    val base = ProductQuantization.annIndex(fit, epoch)
    // a fit over a DIFFERENT corpus has a different fit_id; folding its
    // batch into our base must fail loudly at scan time
    val otherFit = ProductQuantization.fitFrozen(batch)
    assert(otherFit.fitId != fit.fitId, "fit ids must separate geometries")
    val e = intercept[Exception] {
      ProductQuantization.upsertAnnIndex(otherFit,
        base, batch).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("refit requires a full")), e.toString)
    // same fit folds fine, and deletion is an idempotent anti-join
    val folded = ProductQuantization.upsertAnnIndex(fit, base, batch)
    val n = folded.count()
    val deleted = Seq(0L, 123456789L).toDF("vec_id") // one real, one unknown
    val pruned = ProductQuantization.removeFromAnnIndex(folded, deleted, "vec_id")
    assert(pruned.count() == n - 1)
    assert(ProductQuantization.removeFromAnnIndex(pruned, deleted, "vec_id")
      .count() == n - 1, "deleting again must be a no-op")
  }

  test("mergeAnnIndex: disjoint shards union row-for-row; mixed fit refuses on EITHER side") {
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 =!= 0)
    val fit = ProductQuantization.fitFrozen(a)
    val shardA = ProductQuantization.annIndex(fit, a)
    val shardB = ProductQuantization.annIndex(fit, b)
    val merged = ProductQuantization.mergeAnnIndex(fit, shardA, shardB)
    val whole = ProductQuantization.annIndex(fit, emb)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("vec_id"), col("cell"), col("code").cast("string"),
        col("fit_id")).collect().map(_.toSeq.mkString("|")).toSet
    assert(rows(merged) == rows(whole),
      "merge of disjoint shards must equal the whole-corpus index")
    // mixed fit: refusal must fire whichever SIDE carries the alien rows
    val fit2 = ProductQuantization.fitFrozen(b)
    assert(fit2.fitId != fit.fitId)
    val alien = ProductQuantization.annIndex(fit2, b)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    for ((l, r) <- Seq((shardA, alien), (alien, shardB))) {
      val e = intercept[Exception] {
        ProductQuantization.mergeAnnIndex(fit, l, r).count()
      }
      assert(msgs(e).exists(_.contains("mergeAnnIndex")), e.toString)
    }
  }

  test("applyCdcAnn: fold == net-corpus rebuild; untouched partitions carry by reference") {
    import graft.operators.IndexArtifact
    val root = {
      val d = new java.io.File("/tmp/graft-anncdc-spec")
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles
        if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      if (d.exists()) rm(d)
      d.mkdirs(); d.getAbsolutePath
    }
    val m = ProductQuantization.annMember(parts = 8)
    val fit = ProductQuantization.fitFrozen(emb)
    IndexArtifact.writeFull(ProductQuantization.annIndex(fit, emb),
      root, m, 0)
    val man0 = IndexArtifact.readManifest(spark, root, m, 0)
    // one U (re-embed vec 3 as its negation), one D (vec 7), one I
    val batch = emb.filter(col("vec_id") === 3L)
      .select(lit("U").as("op"), col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
      .unionByName(emb.filter(col("vec_id") === 7L)
        .select(lit("D").as("op"), col("vec_id"),
          lit(null).cast("array<float>").as("embedding")))
      .unionByName(emb.filter(col("vec_id") === 11L)
        .select(lit("I").as("op"), (col("vec_id") + 5000L).as("vec_id"),
          col("embedding")))
    ProductQuantization.applyCdcAnn(fit, root, m, batch,
      "vec_id", "embedding", "op", 0, 1)
    val net = emb.filter(col("vec_id") =!= 7L)
      .select(col("vec_id"),
        when(col("vec_id") === 3L, transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      .unionByName(emb.filter(col("vec_id") === 11L)
        .select((col("vec_id") + 5000L).as("vec_id"), col("embedding")))
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("vec_id"), col("cell"), col("code").cast("string"))
        .collect().map(_.toSeq.mkString("|")).toSet
    assert(rows(IndexArtifact.read(spark, root, m, 1)) ==
      rows(ProductQuantization.annIndex(fit, net)))
    // untouched partitions still reference v0
    val touched = batch.select(IndexArtifact.partOf(col("vec_id"), 8))
      .distinct().collect().map(_.getInt(0)).toSet
    val man1 = IndexArtifact.readManifest(spark, root, m, 1)
    assert(touched.size < 8 && man0.keySet.exists(k => !touched(k)))
    for (k <- man0.keySet if !touched(k))
      assert(man1(k) == 0, s"untouched ANN partition $k was rewritten")
  }

  test("residual fit: CRUD composes through the dispatching annIndex; raw fit refused") {
    val epoch = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 =!= 0)
    val fit = ProductQuantization.fitFrozenResidual(epoch)
    assert(fit.residual)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cell"), col("code"), col("fit_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).mkString(","), r.getLong(3))).sorted.toSeq
    // upsertAnnIndex's internal batch encode must dispatch to the
    // RESIDUAL kernel (a raw-encoded batch would silently corrupt)
    val folded = ProductQuantization.upsertAnnIndex(fit,
      ProductQuantization.annIndex(fit, epoch), batch)
    val rebuilt = ProductQuantization.annIndex(fit,
      epoch.unionByName(batch))
    assert(rows(folded) == rows(rebuilt),
      "fold-into-frozen-residual-fit must equal the full rebuild")
    // a raw fit over the same epoch is a different geometry: different
    // id, and folding into the residual index fails loudly
    val rawFit = ProductQuantization.fitFrozen(epoch)
    assert(!rawFit.residual && rawFit.fitId != fit.fitId)
    val e = intercept[Exception] {
      ProductQuantization.upsertAnnIndex(rawFit, folded, batch).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("refit requires a full")), e.toString)
  }

  test("rerankTopK with a full shortlist and all probes equals bruteTopK exactly") {
    val qs = emb.filter(col("vec_id") < 5)
    val fit = ProductQuantization.fitFrozen(emb)
    val idx = ProductQuantization.annIndex(fit, emb)
    val n = emb.count().toInt
    // every cell probed + shortlist covering the corpus -> the exact
    // re-rank sees everything, so stage 2 must reproduce brute force
    // row-for-row (same kernel, same tie rule, same rounding)
    val rr = ProductQuantization
      .rerankTopK(fit, idx, qs, emb, k = 5, shortlist = n, nprobe = 16)
      .select("qid", "nid", "sim", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    val bt = Similarity.bruteTopK(qs, emb, 5)
      .select("qid", "nid", "sim", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(rr.length == 25 && rr.sameElements(bt))
  }

  test("auditAnnIndex: healthy index audits all zeros; each corruption fires exactly its own check") {
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val fit = ProductQuantization.fitFrozen(corpus)
    val idx = ProductQuantization.annIndex(fit, corpus).cache()
    def audit(i: org.apache.spark.sql.DataFrame): Map[String, Long] =
      ProductQuantization.auditAnnIndex(fit, i, corpus)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val healthy = audit(idx)
    assert(healthy.size == 8 && healthy.values.forall(_ == 0L), healthy)
    // each corruption in isolation moves ONE check (encode_mismatch
    // additionally fires for wrong-but-well-formed cells/codes)
    assert(audit(idx.filter(col("vec_id") =!= 0L))
      ("vec_missing_from_index") == 1L)
    val ghost = Seq((999999L, 0, Seq.fill(fit.model.m)(0), fit.fitId))
      .toDF("vec_id", "cell", "code", "fit_id")
    assert(audit(idx.unionByName(ghost))("index_orphans") == 1L)
    val dup = audit(idx.unionByName(idx.filter(col("vec_id") === 3L)))
    assert(dup("dup_vec_ids") == 1L && dup("encode_mismatch") == 0L)
    val badCell = audit(idx.withColumn("cell",
      when(col("vec_id") === 5L, lit(-1)).otherwise(col("cell"))))
    assert(badCell("cell_out_of_range") == 1L &&
      badCell("encode_mismatch") == 1L)
    val shortCode = audit(idx.withColumn("code",
      when(col("vec_id") === 7L, slice(col("code"), 1, fit.model.m - 1))
        .otherwise(col("code"))))
    assert(shortCode("code_len_mismatch") == 1L &&
      shortCode("encode_mismatch") == 1L)
    val badSub = audit(idx.withColumn("code",
      when(col("vec_id") === 9L,
        concat(array(lit(99)), slice(col("code"), 2, fit.model.m - 1)))
        .otherwise(col("code"))))
    assert(badSub("subcode_out_of_range") == 1L &&
      badSub("encode_mismatch") == 1L)
    val badFit = audit(idx.withColumn("fit_id",
      when(col("vec_id") === 11L, col("fit_id") + 1L)
        .otherwise(col("fit_id"))))
    assert(badFit("fit_id_mismatch") == 1L &&
      badFit("encode_mismatch") == 0L)
    idx.unpersist()
  }
}
