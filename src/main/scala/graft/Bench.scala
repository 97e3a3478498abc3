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
    // Optional sf1 spot-check: when the ScaleGen'd 10x dataset exists, also
    // measure the headline queries against it, so the linear-scaling posture
    // is a measured ratio instead of an argument from plan shapes. A missing
    // dir just omits the field — the one-line driver contract is unchanged.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val sf1Json =
      if (!new java.io.File(s"$sf1Dir/lineitem.parquet").exists()) ""
      else {
        val headline = Seq("q01_agg_pricing", "q04_join_shuffle", "q17_salted_join",
          "t08_ngram_topk", "d01_exact_dedup", "d02_minhash_lsh", "d12_ann_pq",
          "p14_corpus_pipeline", "p19_training_mix", "s01_window_agg")
        headline.foreach { k =>
          try SparkEntry.queries(k)(spark, sf1Dir).count() catch { case _: Throwable => () }
        }
        val b1 = scala.collection.mutable.Map.empty[String, Double]
        val f1 = scala.collection.mutable.Set.empty[String]
        for (_ <- 1 to 2; k <- headline) {
          val t0 = System.nanoTime()
          val ok = try { SparkEntry.queries(k)(spark, sf1Dir).count(); true }
                   catch { case _: Throwable => false }
          if (!ok) f1 += k
          else b1(k) = math.min(b1.getOrElse(k, Double.MaxValue), (System.nanoTime() - t0) / 1e9)
        }
        val entries = headline.map { k =>
          "\"" + k + "\":" + (if (f1(k) || !b1.contains(k)) -1.0 else b1(k))
        }.mkString("{", ",", "}")
        s""","sf1_headline":$entries,"sf1_dir":"$sf1Dir""""
      }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"$sf1Json}""")
    spark.stop()
  }
}
