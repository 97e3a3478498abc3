package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement loop behind the d02/m09 band-bucket occupancy analysis
  * (SURVEY §7f): reports the LSH band-bucket size distribution and times
  * each stage of the minhash pair view at a given scale point, so the
  * "collision density grows with the corpus" trend is measured, not
  * guessed. `runMain graft.DedupScaleProbe <sfDir>`.
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val sigs = operators.Dedup.probeSignatures(spark, dir).cache()
    val nDocs = timed("signatures")(sigs.count())
    println(s"[probe] docs: $nDocs")

    val banded = operators.Dedup.probeBands(sigs).cache()
    timed("banding")(banded.count())

    val occ = banded.groupBy($"band_id", $"band_key").agg(count(lit(1)).as("c")).cache()
    timed("bucket occupancy") {
      val stats = occ.agg(
        count(lit(1)).as("n_buckets"),
        max($"c").as("max_c"),
        expr("percentile_approx(c, array(0.5, 0.9, 0.99, 0.999), 10000)").as("q"),
        sum(when($"c" > 1, $"c" * (operators.Dedup.NeighborWindow: Int))
          .otherwise(0L)).as("pair_upper_bound"),
        // what an EXHAUSTIVE bucket self-join (successorWindow = None — the
        // d31-class pair views) would materialize: sum c·(c−1)/2. The gap
        // between this and pair_upper_bound is the quadratic-vs-linear
        // spread that decides which keys are gateable at a scale point.
        sum($"c" * ($"c" - 1) / 2).cast("long").as("exhaustive_pairs"),
        sum(when($"c" > 1000, 1L).otherwise(0L)).as("buckets_gt_1k"),
        sum(when($"c" > 10000, 1L).otherwise(0L)).as("buckets_gt_10k"),
        sum(when($"c" > 100000, 1L).otherwise(0L)).as("buckets_gt_100k")
      ).head()
      println(s"[probe] occupancy: $stats")
      occ.orderBy($"c".desc).limit(10).collect()
        .foreach(r => println(s"[probe] hot bucket: $r"))
    }

    timed("full d02")(operators.Dedup.minhashLsh(spark, dir).count())
    spark.stop()
  }
}
