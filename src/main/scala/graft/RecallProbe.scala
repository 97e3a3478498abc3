package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: print raw recall@K per ANN method (the numbers behind
  * d13's boolean claim rows) so floor tuning is measured, not guessed.
  * Usage: runMain graft.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val exact = graft.operators.Similarity.cosineTopK(spark, dir)
      .select($"query_id", $"neighbor_id")
    val methods = Seq(
      "ivf" -> graft.operators.Similarity.annIvf(spark, dir),
      "ivf2" -> graft.operators.Similarity.annIvfTrained(spark, dir),
      "lsh" -> graft.operators.Similarity.annLsh(spark, dir),
      "pq" -> graft.operators.Similarity.annPq(spark, dir))
    methods.foreach { case (name, df) =>
      val r = df.select($"query_id", $"neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble /
        (graft.operators.Similarity.K * graft.operators.Similarity.NumQueries)
      System.err.println(f"[recall] $name%-5s $r%.3f  ($dir)")
    }
    spark.stop()
  }
}
