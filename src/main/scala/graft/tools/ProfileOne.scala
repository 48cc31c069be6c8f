package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Profiles one registered query: runs it cold then warm, and for the
  * WARM run prints per-stage wall time, task count, executor run time,
  * and shuffle bytes — the §1 "measure first" loop without the UI.
  * `sbt "runMain graft.tools.ProfileOne <query> [sfDir] [reps]"` */
object ProfileOne {
  case class St(id: Int, name: String, tasks: Int, wallMs: Long,
                runMs: Long, shufReadB: Long, shufWriteB: Long, inB: Long)

  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer[St]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(80), si.numTasks,
          wall, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead)
      }
    }

    for (i <- 1 to reps) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val last = i == reps
      if (last) { stages.clear(); jobs = 0; spark.sparkContext.addSparkListener(listener) }
      val t0 = System.nanoTime()
      val n = graft.Queries.all(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $name rep=$i rows=$n t=$dt%.3fs")
      if (last) {
        // listener events are async; give the bus a moment to drain
        Thread.sleep(500)
        println(f"  jobs=$jobs stages=${stages.size} tasks=${stages.map(_.tasks).sum} " +
          f"sumStageWall=${stages.map(_.wallMs).sum}ms sumExecRun=${stages.map(_.runMs).sum}ms " +
          f"shufRead=${stages.map(_.shufReadB).sum} shufWrite=${stages.map(_.shufWriteB).sum}")
        stages.sortBy(-_.wallMs).take(30).foreach { s =>
          println(f"  stage ${s.id}%4d wall=${s.wallMs}%5dms run=${s.runMs}%5dms tasks=${s.tasks}%3d " +
            f"sr=${s.shufReadB}%8d sw=${s.shufWriteB}%8d in=${s.inB}%9d  ${s.name}")
        }
      }
    }
    spark.stop()
  }
}
