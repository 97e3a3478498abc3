package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // see Tables.events
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warm pass: whole-stage codegen compiles each plan once (Janino costs
    // ~5-8s for the deepest plans in a cold JVM); report steady-state times,
    // which is what a long-lived cluster session actually sees.
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Three timed ROUNDS in round-robin order (rep 1 of every query, then
    // rep 2 of every query, ...), min per query across rounds: a transient
    // GC/compilation episode lands on different queries in different rounds,
    // so the reported min is robust to bench order — round 2 saw p14 read
    // 3.5x its isolated steady state purely from order-sensitive noise.
    val reps = 3
    val best = scala.collection.mutable.Map.empty[String, Double]
    val failedKeys = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to reps; (name, fn) <- ordered) {
      val t0 = System.nanoTime()
      // a failed query must not read as a fast success: mark, don't time
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      if (!ok) failedKeys += name
      else {
        val dt = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      }
    }
    val results = ordered.map { case (name, _) =>
      name -> (if (failedKeys(name) || !best.contains(name)) -1.0 else best(name))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
