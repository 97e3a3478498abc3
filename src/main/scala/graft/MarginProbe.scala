package graft
import org.apache.spark.sql.SparkSession
object MarginProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.Similarity.cohesionMargins(spark, args(0)).collect()
      .foreach(r => System.err.println(s"[margin] ${r.getString(0)} = ${r.getDouble(1)}"))
    spark.stop()
  }
}
