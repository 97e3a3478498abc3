package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: print per-method ANN recall@K values (not just the d13
  * floor booleans) for each sf dir given on the command line — the
  * measurement loop behind tuning [[graft.operators.Similarity]] probe
  * parameters and setting RecallFloors.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    for (dir <- args) {
      val exact = Similarity.cosineTopK(spark, dir)
        .select(col("query_id"), col("neighbor_id")).cache()
      // SPARK_GRAFT_PQ_DEPTHS (comma-sep) adds forced-depth PQ rows — the
      // PqMaxDepth binding-regime measurement: a forced depth d on an
      // n-vector corpus reads out the recall a (PqReRankFrac·N / d)·n-vector
      // production corpus would get once the cap binds at depth d
      val pqDepths = sys.env.get("SPARK_GRAFT_PQ_DEPTHS")
        .map(_.split(",").toSeq.map(_.trim.toLong)).getOrElse(Nil)
      val methods = Seq(
        "lsh" -> Similarity.annLsh(spark, dir),
        "ivf" -> Similarity.annIvf(spark, dir),
        "ivf2" -> Similarity.annIvfTrained(spark, dir),
        "pq" -> Similarity.annPq(spark, dir)) ++
        pqDepths.map(d => s"pq@$d" -> Similarity.annPqAtDepth(spark, dir, Some(d)))
      for ((name, df) <- methods) {
        val hits = df.select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
        val total = Similarity.K * Similarity.NumQueries
        System.err.println(f"[recall] $dir $name%-5s ${hits.toDouble / total}%.2f")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
