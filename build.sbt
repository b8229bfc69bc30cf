ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "snapshotsenderspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// ---- Parallel forked test groups (round-20 verification-envelope fix) ----
// One sequential 37-suite JVM ran 649 s on a quiet 32-core host and blew
// the driver's window under contention (r19: killed at ~28 min). Suites
// are balanced into fixed groups by measured duration (the r20 -oD
// baseline below; unknown suites default to 5 s) and each group forks its
// own JVM with its own local[8] SparkSession. Cross-suite state is
// JVM-confined (SparkSuite.getOrCreate per JVM) or suite-private on disk
// (every spec uses its own /tmp/graft-* fixture path; /root/testdata is
// read-only), so group-level parallelism cannot race: verified by grep
// over the spec sources — no two suites share a fixture dir, only
// LayoutSpec writes spark-warehouse tables, and CacheDisciplineSpec
// isolates via clearCache() within its JVM.
val suiteSeconds: Map[String, Double] = Map(
  "GraphSpec" -> 38.0, // post-diet: the tol=0 unrolled replay is gone
  "SnapshotDsv2Spec" -> 84.5, "SketchesSpec" -> 51.1,
  "CurationSpec" -> 46.8, "IndexArtifactSpec" -> 46.4, "Bm25Spec" -> 40.2,
  "TfIdfSpec" -> 5.1, // TfIdfSpec.scala holds TfIdfSpec AND Bm25Spec
  "SimilaritySpec" -> 31.9, "HttpTransportSpec" -> 30.3,
  "PlanSpec" -> 28.7, "StreamingRecoverySpec" -> 28.2,
  "SnapshotJobSpec" -> 21.3, "ProductQuantizationSpec" -> 20.4,
  "LayoutSpec" -> 18.9, "DedupGroupsSpec" -> 16.2, "StreamingSpec" -> 11.1,
  "DedupSpec" -> 7.7, "CrossModalSpec" -> 7.1, "SnapshotStreamSpec" -> 5.2,
  "ParitySpec" -> 5.0, "CompactionSpec" -> 4.7, "CacheDisciplineSpec" -> 3.9,
  "DsirSpec" -> 3.7, "ScaleSpec" -> 3.4, "BloomSpec" -> 3.0,
  "MetricsSpec" -> 2.7, "MonitoringSpec" -> 2.7, "DiffSpec" -> 2.1,
  "MultimodalSpec" -> 2.0, "SketchSpec" -> 1.7, "BpeSpec" -> 1.6,
  "AsOfJoinSpec" -> 1.2, "FusionSpec" -> 1.2, "CharLangIdSpec" -> 0.9)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // each group JVM believes it owns 8 cores (matching its local[8]
  // session) — without this, 4 JVMs each size GC/JIT/netty pools for all
  // 32 hardware threads and the kernel burns more time scheduling than
  // the tests spend working (measured: 43 min sys for 32 min user)
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector ++ Vector(
      "-XX:ActiveProcessorCount=8",
      // test JVMs stay at 8g (last -Xmx wins): suites run tiny data on
      // local[8]; four 16g heaps re-introduced the kernel-page thrash
      // the ActiveProcessorCount cap had removed (measured 216 s → 469 s)
      "-Xmx8g"))
  // 4 groups × local[8] ≅ 32 hardware threads. Measured: 4 groups 337 s,
  // 6 groups 562 s (kernel-scheduler thrash: 66 min sys), 1 group 649 s.
  val nGroups = 4
  // greedy longest-first bin packing over measured suite durations
  val weighted = tests.map(t =>
      t -> suiteSeconds.getOrElse(t.name.stripPrefix("graft."), 5.0))
    .sortBy(-_._2)
  val bins = Array.fill(nGroups)(Vector.empty[sbt.TestDefinition])
  val loads = Array.fill(nGroups)(0.0)
  weighted.foreach { case (t, w) =>
    val i = loads.indexOf(loads.min)
    bins(i) = bins(i) :+ t
    loads(i) += w
  }
  bins.zipWithIndex.collect { case (ts, i) if ts.nonEmpty =>
    Tests.Group(s"tests-g$i", ts, Tests.SubProcess(forkOpts))
  }.toSeq
}
// default restriction caps forked test groups at 1 — lift it to the group
// count (4 × local[8] JVMs ≅ the 32 hardware threads), keep overall task
// parallelism at the sbt default
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors())),
  Tags.limit(Tags.ForkedTestGroup, 4))
// Pass the forked JVM's stdout through UNPREFIXED. The default
// LoggedOutput strategy prepends "[info] " to every stdout line, which
// made Bench's single-line JSON unparseable by the driver in rounds 1-2
// (BENCH_r0{1,2}.json: "parsed": null).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g → 16g default (r20, guide §5): in local mode the one JVM is
  // driver AND executor — at local[32], 8g gave ~32 concurrent tasks
  // under 80 MB of execution memory each, and a full 341-query session
  // degraded into GC thrash (measured: the same 24-query subset read
  // vs_anchor 1.06/regress 3 at 8g and 0.82/regress 0 at 16g; q76
  // 7.98 s → 2.56 s). Still env-parameterised for smaller hosts; 16g
  // is ~12% of this sandbox's 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
