package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Whole-execution audit (dev tool): runs each named query end-to-end into
  * the noop sink and reports what the FINAL `explain` cannot show for the
  * iterative/checkpointed operators — the total number of jobs and stages
  * the query actually launches, and the total shuffle read/write bytes
  * across every job, localCheckpoint materializations included.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
  *     sbt "runMain graft.JobAudit q_pagerank q_bfs_hops"
  *
  * The stage metrics come from a SparkListener (guide §7.1's task-metrics
  * table, scripted), so "this change removed a join per round" is checkable
  * as a drop in stage count and shuffle bytes, not just a wall-clock delta.
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    val input = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          input.addAndGet(m.inputMetrics.bytesRead): Unit
        }
      }
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("q_pagerank")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
      // warmup once (codegen/JIT), then measure one clean execution; the
      // listener bus is async — a short settle keeps counters attributed
      Thread.sleep(500)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(1500)
      jobs.set(0); stages.set(0); shufWrite.set(0L); shufRead.set(0L); input.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"[jobaudit] $name%-28s jobs=${jobs.get}%-3d stages=${stages.get}%-4d " +
        f"shuffle_write=${shufWrite.get}%-12d shuffle_read=${shufRead.get}%-12d " +
        f"input=${input.get}%-12d sec=$sec%.3f")
    }
    spark.stop()
  }
}
