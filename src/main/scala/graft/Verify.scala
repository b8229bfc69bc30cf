package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Partial-artifact hardening (the CORRECTNESS_r16 == `{}` post-mortem —
  * an all-or-nothing failure: the driver's budget fired before anything
  * was adjudicable):
  *   - oracle_sql.json is written FIRST, before any query runs, so a
  *     truncated run still pairs every finished dump with its oracle;
  *   - queries run CHEAPEST-FIRST (by the fixed Bench.anchor, unanchored
  *     at the 1.0 s midpoint) — a budget kill preserves the most
  *     verdicts per second spent;
  *   - an internal deadline (SPARK_GRAFT_VERIFY_DEADLINE, default 900 s)
  *     stops cleanly before an external killer would: remaining names
  *     are listed loudly and the exit is 0 with everything finished so
  *     far on disk (the Bench r7 deadline discipline applied to t2).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val t0 = System.nanoTime()
    val deadlineSec = sys.env.get("SPARK_GRAFT_VERIFY_DEADLINE")
      .flatMap(_.toDoubleOption).getOrElse(900.0).max(1.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // spark.local.dir off /tmp (the BENCH_r15 reaper post-mortem applies
    // to any long Spark run): shuffle files under a workspace dir are
    // outside external /tmp cleaners' remit.
    val localDir = new java.io.File("target/spark-local").getAbsolutePath
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ordered = Registry.all
      .filter(q => only.forall(_.contains(q.name)))
      .sortBy(q => (Bench.anchor.getOrElse(
        q.name.takeWhile(_ != '_'), 1.0), q.name))
    var skipped = List.empty[String]
    ordered.foreach { qr =>
      val elapsed = (System.nanoTime() - t0) / 1e9
      if (elapsed > deadlineSec) skipped ::= qr.name
      else {
        val tq = System.nanoTime()
        try graft.operators.OperatorCaches.withCaches {
          qr.fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/${qr.name}")
          System.err.println(
            f"[verify] ${qr.name} ok ${(System.nanoTime() - tq) / 1e9}%.1fs")
        }
        catch { case e: Throwable =>
          System.err.println(s"[verify] ${qr.name} failed: ${e.getMessage}")
        }
      }
    }
    if (skipped.nonEmpty)
      System.err.println(s"[verify] DEADLINE ${deadlineSec}s hit — skipped " +
        s"${skipped.size} queries: ${skipped.reverse.mkString(",")}")
    spark.stop()
  }
}
