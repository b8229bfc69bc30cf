package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `sbt "runMain graft.Explain <queryName|pipeline> [sfDir]"`
  * prints the formatted physical plan (PushedFilters / ReadSchema /
  * WholeStageCodegen spans) — the feedback loop for the perf pass. */
object Explain {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("pipeline")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = target match {
      case "pipeline" =>
        val fixture = "/tmp/graft-fixture-explain"
        graft.sources.SnapshotFixture.generate(fixture,
          graft.sources.SnapshotFixture.defaultTopics(2, 10))
        graft.operators.SnapshotJob.records(spark, fixture,
          graft.sources.LocalKeyService)
      case name => SparkEntry.queries(name)(spark, dir)
    }
    df.explain("formatted")
    println(s"ROWS=${df.count()}")
    spark.stop()
  }
}
