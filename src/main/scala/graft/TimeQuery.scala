package graft

import org.apache.spark.sql.SparkSession

/** Times registered queries repeatedly:
  * `runMain graft.TimeQuery <sfDir> <name...> [reps]`. Complements Bench
  * when iterating on a single hot operator; several names share one JVM
  * (a trailing integer arg is the rep count — query keys never parse as
  * integers).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val (names, reps) = args.drop(1).lastOption.flatMap(_.toIntOption) match {
      case Some(r) => (args.drop(1).dropRight(1).toSeq, r)
      case None    => (args.drop(1).toSeq, 3)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // see Tables.events
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"[time] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
      }
    }
    spark.stop()
  }
}
