package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage wall/CPU/shuffle profile of one catalog query (dev tool,
  * guide §1: measure first). Usage:
  *
  *   sbt 'runMain graft.tools.StageProfile <query> [dir] [reps]'
  *
  * Runs the query through the noop sink (full-column execution, same
  * timed action as the bench), collecting per-stage metrics from a
  * SparkListener: submitted→completed wall span, summed executor run
  * time (how parallel the stage was), task count, shuffle read/write
  * bytes and records, input bytes, and spill. A warm-up pass at
  * sf0.001 amortizes JIT/codegen like the bench does. Stages sort by
  * wall span so the expensive exchange is the first line you read.
  */
object StageProfile {
  case class StageRow(id: Int, name: String, wallMs: Long, runMs: Long, cpuMs: Long,
      tasks: Int, inBytes: Long, srBytes: Long, srRecords: Long, swBytes: Long,
      swRecords: Long, spill: Long, outRecords: Long)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local()
    names.foreach(profileOne(spark, _, dir, reps))
    spark.stop()
  }

  def profileOne(spark: org.apache.spark.sql.SparkSession, name: String, dir: String,
      reps: Int): Unit = {
    val fn = SparkEntry.queries(name)

    val rows = mutable.ArrayBuffer[StageRow]()
    val submitted = mutable.Map[Int, Long]()
    var collecting = false
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (collecting) submitted(s.stageInfo.stageId) = System.currentTimeMillis()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = if (collecting) {
        val i = s.stageInfo
        val m = i.taskMetrics
        rows += StageRow(
          i.stageId, i.name.takeWhile(_ != '\n'),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(
            submitted.getOrElse(i.stageId, 0L)),
          m.executorRunTime, m.executorCpuTime / 1000000,
          i.numTasks, m.inputMetrics.bytesRead,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.bytesWritten, m.shuffleWriteMetrics.recordsWritten,
          m.memoryBytesSpilled + m.diskBytesSpilled,
          m.outputMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm-up (JIT/codegen) outside the measured window, like the bench
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    for (r <- 1 to reps) {
      graft.Bench.resetSharedState(spark)
      rows.clear(); submitted.clear(); collecting = true
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      collecting = false
      // listener bus is async; give the completion events a moment
      Thread.sleep(300)
      def mb(v: Long) = f"${v / 1048576.0}%8.1f"
      println(f"%n[stageprof] $name rep=$r total=$dt%.2fs stages=${rows.size}")
      println("  wall_s  run_s  cpu_s tasks    in_MB    sr_MB  sr_rec    sw_MB  sw_rec spill_MB  stage")
      rows.sortBy(-_.wallMs).take(18).foreach { s =>
        println(f"  ${s.wallMs / 1000.0}%6.2f ${s.runMs / 1000.0}%6.1f ${s.cpuMs / 1000.0}%6.1f " +
          f"${s.tasks}%5d ${mb(s.inBytes)} ${mb(s.srBytes)} ${s.srRecords}%7d ${mb(s.swBytes)} " +
          f"${s.swRecords}%7d ${mb(s.spill)}  [${s.id}] ${s.name.take(60)}")
      }
      val wallSum = rows.map(_.wallMs).sum / 1000.0
      val runSum = rows.map(_.runMs).sum / 1000.0
      println(f"  [sums] stage-wall=$wallSum%.2fs executor-run=$runSum%.2fs " +
        f"(parallelism=${runSum / wallSum}%.1fx) driver-gap=${dt - wallSum}%.2fs")
    }
    spark.sparkContext.removeSparkListener(listener)
  }
}
