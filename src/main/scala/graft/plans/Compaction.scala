package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction — the OPTIMIZE table-maintenance primitive a
  * continuously ingested lake needs (reference semantics: master_script.py's
  * per-space output dirs accrete one file per incremental run; a 100-TB
  * table ingesting micro-batches accretes millions): plan merge jobs over
  * a file LISTING (driver-sized — the listing, never the data), then each
  * job concatenates its files into one output file with ZERO shuffle —
  * compaction is pure IO, an exchange-free read→write per job.
  *
  * The plan is p26's greedy sequential packing applied to files: within a
  * partition, files in listing order accumulate into a job until the
  * target byte budget fills (exclusive-prefix-sum div target — exact
  * integers, so the same listing always plans the same jobs). Jobs are
  * independent; production submits them as parallel Spark jobs (or one
  * job with a per-group mapPartitions), the spec executes them serially.
  */
object Compaction {

  /** One row per file → (part, file, bytes, job): greedy sequential
    * packing by exclusive cumulative size div target, partition-local.
    */
  def plan(listing: DataFrame, targetBytes: Long): DataFrame = {
    val s = listing.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"part").orderBy($"file")
      .rowsBetween(Window.unboundedPreceding, -1)
    listing.withColumn("job",
      (coalesce(sum($"bytes").over(w), lit(0L)) / targetBytes).cast("long"))
  }

  /** Merge each planned job's files into one output file under
    * `outDir/part=<part>/`. The per-job read is the job's exact file list
    * and the write is coalesce(1) — no exchange anywhere; the driver loop
    * is bounded by the JOB count (listing-sized, the documented
    * tiny-collect exception).
    */
  def execute(s: SparkSession, planned: DataFrame, outDir: String): Unit = {
    import s.implicits._
    val jobs = planned.groupBy($"part", $"job")
      .agg(collect_list($"file").as("files")).collect()
    jobs.foreach { r =>
      val part = r.getString(0)
      val files = r.getSeq[String](2)
      s.read.parquet(files: _*).coalesce(1)
        .write.mode("append").parquet(s"$outDir/part=$part")
    }
  }
}
