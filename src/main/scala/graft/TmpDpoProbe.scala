package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpDpoProbe extends App {
  val s = SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/dpo_test/wh")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .getOrCreate()
  import s.implicits._
  def dirs(p: String) = Option(new java.io.File(p).listFiles).map(_.map(_.getName).sorted.mkString(",")).getOrElse("<gone>")
  val df = (0 until 100).map(i => (i.toLong, s"h$i", i % 8)).toDF("v", "chunk_hash", "pb")

  // A: partitioned + bucketed, conf-level dynamic
  df.write.option("path", "/tmp/dpo_test/tA")
    .partitionBy("pb").bucketBy(4, "chunk_hash").sortBy("chunk_hash")
    .mode("overwrite").saveAsTable("tA")
  Seq((999L, "h3", 3)).toDF("v", "chunk_hash", "pb")
    .write.mode("overwrite").insertInto("tA")
  println("A dirs after insert: " + dirs("/tmp/dpo_test/tA"))
  println("A total rows: " + s.table("tA").count())

  // B: partitioned only (no buckets), conf-level dynamic
  df.write.option("path", "/tmp/dpo_test/tB")
    .partitionBy("pb")
    .mode("overwrite").saveAsTable("tB")
  Seq((999L, "h3", 3)).toDF("v", "chunk_hash", "pb")
    .write.mode("overwrite").insertInto("tB")
  println("B dirs after insert: " + dirs("/tmp/dpo_test/tB"))
  println("B total rows: " + s.table("tB").count())
  s.stop()
}
object TmpDpoProbe2 extends App {
  val s = SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/dpo_test/wh")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()
  import s.implicits._
  val other = (0 until 50).map(i => (s"h$i", i.toLong)).toDF("chunk_hash", "x")

  // in-memory catalog is per-JVM: recreate
  val df = (0 until 100).map(i => (i.toLong, s"h$i", i % 8)).toDF("v", "chunk_hash", "pb")
  df.write.option("path", "/tmp/dpo_test/tC")
    .partitionBy("pb").bucketBy(4, "chunk_hash").sortBy("chunk_hash")
    .mode("overwrite").saveAsTable("tC")
  Seq((999L, "h3", 3)).toDF("v", "chunk_hash", "pb")
    .write.mode("overwrite").insertInto("tC")
  val j2 = s.table("tC").join(other, Seq("chunk_hash"))
  j2.collect()
  val plan = j2.queryExecution.executedPlan.toString
  println("JOINPLAN>>")
  println(plan.split("\n").filter(l => l.contains("Exchange") || l.contains("Scan") || l.contains("SortMergeJoin")).mkString("\n"))
  // filtered-partition read + join: still bucketed?
  val j3 = s.table("tC").filter($"pb".isin(3, 4)).join(other, Seq("chunk_hash"))
  j3.collect()
  println("FILTEREDPLAN>>")
  println(j3.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("Exchange") || l.contains("Scan")).mkString("\n"))
  s.stop()
}
