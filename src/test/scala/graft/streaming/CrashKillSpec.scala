package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.fixtures.ClipGen
import graft.operators.Windows

/** The ROADMAP "kill -9 soak": unlike ExactlyOnceSpec's in-process
  * restarts (graceful stop between batches), this launches the streaming
  * job in a SEPARATE JVM (graft.tools.CrashStreamChild) and SIGKILLs it
  * at increasing checkpoint-commit depths — the kill can land mid-batch,
  * mid-state-store-commit, mid-delta-write, or inside the incremental
  * compaction swap (the child compacts every 3 deltas to widen that
  * window). After repeated hard kills plus one clean run, the sink must
  * equal the batch ground truth exactly — nothing lost, nothing doubled. */
class CrashKillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** JDK17 module opens for a bare Spark JVM — same list as build.sbt. */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("SIGKILL crash soak: exactly-once survives hard kills at random depths") {
    val staged = Files.createTempDirectory("crash-staged").toString
    TestSpark.writeTimeOrdered(ClipGen.clipsDf(spark, 240), staged, 12)
    val expected = Windows.tumblingCounts(spark.read.parquet(staged))
      .orderBy("w_start_ms", "codec", "sr_hz").collect().map(_.toSeq).toSeq

    val tableDir = Files.createTempDirectory("crash-sink").toString
    val ckpt = Files.createTempDirectory("crash-ckpt").toString
    val childLog = Files.createTempDirectory("crash-log")

    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    def launch(tag: String): Process = new ProcessBuilder(
      (Seq(java) ++ addOpens ++ Seq(
        "-Xmx3g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.CrashStreamChild", staged, tableDir, ckpt)).asJava)
      .redirectOutput(childLog.resolve(s"$tag.out").toFile)
      .redirectErrorStream(true)
      .start()

    /** Completed micro-batch commits in the checkpoint (numeric names). */
    def commits(): Int = {
      val d = Paths.get(ckpt, "commits")
      if (!Files.exists(d)) 0
      else {
        val s = Files.list(d)
        try s.iterator().asScala.count(_.getFileName.toString.forall(_.isDigit))
        finally s.close()
      }
    }

    var kills = 0
    // Per-attempt post-commit delay before the SIGKILL: commit-boundary
    // polling alone always kills just after a commit file appears; the
    // staggered offsets land kills DEEP inside the next batch's work —
    // delta write, RocksDB state commit, compaction fold, GC sweep —
    // composing more crash-window permutations (ROADMAP r3). Fixed
    // offsets keep the soak deterministic run-to-run.
    val killDelaysMs = Seq(0L, 140L, 450L, 900L, 1700L)
    for (attempt <- 1 to killDelaysMs.length) {
      val p = launch(s"kill$attempt")
      // SIGKILL once the child has committed `attempt` batches beyond
      // where the last attempt died — each kill lands at a fresh depth,
      // including inside batch processing right after a commit appears
      val target = commits() + attempt
      val t0 = System.currentTimeMillis()
      while (p.isAlive && commits() < target &&
             System.currentTimeMillis() - t0 < 180000) Thread.sleep(50)
      if (p.isAlive) {
        Thread.sleep(killDelaysMs(attempt - 1))
        // the child may drain and exit during the offset sleep — only a
        // kill that lands on a LIVE process counts toward the soak
        val wasAlive = p.isAlive
        p.destroyForcibly()
        p.waitFor(60, TimeUnit.SECONDS)
        if (wasAlive) kills += 1
      } else {
        // drained everything before reaching the target depth — fine,
        // exactly-once must still hold below
        assert(p.exitValue() == 0, s"child died on its own: ${p.exitValue()}")
      }
    }
    assert(kills >= 2, s"soak only killed $kills children — test proved nothing")

    // clean final run: recover from whatever the kills left behind and
    // drain the rest
    val fin = launch("final")
    assert(fin.waitFor(300, TimeUnit.SECONDS), "final child timed out")
    assert(fin.exitValue() == 0,
      s"final child failed (${fin.exitValue()}): " +
        new String(Files.readAllBytes(childLog.resolve("final.out"))).takeRight(2000))

    val table = ClipTable(tableDir, Seq("w_start_ms", "codec", "sr_hz"),
      numBuckets = 2, mergeOnRead = true)
    val got = table.read(spark)
      .select("w_start_ms", "codec", "sr_hz", "n_clips", "sum_dur_ms")
      .orderBy("w_start_ms", "codec", "sr_hz").collect().map(_.toSeq).toSeq
    assert(got == expected, "sink diverged from batch truth after SIGKILLs")
  }
}
