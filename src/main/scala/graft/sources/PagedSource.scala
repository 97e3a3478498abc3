package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A custom DSv2 batch connector modeling the reference's paginated API
  * client (/root/reference/api_client/confluence_client.py:94-235: pages
  * fetched one GET at a time, CQL predicates narrowing what the server
  * returns). Spark-first mapping:
  *
  *   - one REST page            -> one InputPartition (fetched in parallel
  *                                 by executors, not sequentially)
  *   - CQL filter in the URL    -> predicate pushdown: id bounds prune
  *                                 whole pages at PLANNING time, before any
  *                                 "fetch" happens
  *   - fields= projection       -> column pruning: the reader materializes
  *                                 only the requested columns
  *   - persisted session auth   -> sensitive connector options: the
  *                                 reference keeps encrypted session cookies
  *                                 on disk (utilities/secure_cookie_manager
  *                                 .py:1-290); the engine-relevant contract
  *                                 is that a credential option ("token",
  *                                 "cookie") flows intact to every reader
  *                                 factory (across instantiations and
  *                                 executor serialization) while NEVER
  *                                 appearing in plan/explain text — scan
  *                                 descriptions redact it
  *
  * The synthetic row set (id, page, body) is deterministic so specs can
  * assert exact results. Usage:
  *
  *   spark.read.format("graft.sources.PagedSource")
  *     .option("pages", "8").option("pagesize", "100")
  *     .option("token", "s3cret").load()
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PagedSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // the row set is synthetic and fixed: a renamed/retyped user schema
    // would crash mid-scan — reject it at planning time instead
    if (schema != null && !PagedSource.sameShape(schema, PagedSource.Schema))
      throw new UnsupportedOperationException(
        s"graft.sources.PagedSource does not support user-specified schemas; " +
          s"got ${schema.simpleString}, table schema is ${PagedSource.Schema.simpleString}")
    new PagedTable(properties.getOrDefault("pages", "4").toInt,
                   properties.getOrDefault("pagesize", "100").toInt,
                   PagedSource.credentialOf(properties))
  }
}

object PagedSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("body", StringType, nullable = false)))

  /** Connector options treated as credentials: never shown in plans. */
  val SensitiveOptions: Set[String] = Set("token", "cookie")
  val Redacted = "***redacted***"

  private[sources] def sameShape(a: StructType, b: StructType): Boolean =
    a.fields.length == b.fields.length &&
      a.fields.zip(b.fields).forall { case (x, y) => x.name == y.name && x.dataType == y.dataType }

  private[sources] def credentialOf(properties: java.util.Map[String, String]): String =
    SensitiveOptions.iterator.map(properties.get).find(_ != null).getOrElse("")
}

class PagedTable(pages: Int, pageSize: Int, credential: String) extends Table with SupportsRead {
  // name() surfaces in plan text: carries auth PRESENCE, never the value
  override def name(): String =
    s"graft_paged(${pages}x$pageSize, auth=${if (credential.isEmpty) "none" else PagedSource.Redacted})"
  override def schema(): StructType = PagedSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(pages, pageSize, credential)
}

class PagedScanBuilder(pages: Int, pageSize: Int, credential: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedSource.Schema
  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // id bounds prune pages; they are used as a PREFILTER only (pages are
    // ranges, rows inside a surviving page may still violate), so every
    // filter is also returned for Spark to re-evaluate post-scan — the
    // same contract parquet row-group statistics follow
    accepted = filters.filter {
      case GreaterThan("id", _: java.lang.Long) | GreaterThanOrEqual("id", _: java.lang.Long) |
           LessThan("id", _: java.lang.Long) | LessThanOrEqual("id", _: java.lang.Long) |
           EqualTo("id", _: java.lang.Long) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new PagedScan(pages, pageSize, required, accepted, credential)
}

case class PagedPartition(page: Int, pageSize: Int) extends InputPartition

class PagedScan(pages: Int, pageSize: Int, required: StructType, pushed: Array[Filter],
                credential: String)
    extends Scan with Batch {

  // page p covers ids [p*pageSize, (p+1)*pageSize); intersect with the
  // pushed id bounds at PLANNING time — pruned pages are never "fetched"
  private val (lo, hi): (Long, Long) = {
    var l = Long.MinValue
    var h = Long.MaxValue
    // strict bounds at the Long extremes are unsatisfiable; v+1 / v-1
    // would wrap and silently widen the range back to a full scan. The
    // empty marker is sticky: l only ever grows and h only ever shrinks.
    def markEmpty(): Unit = { l = Long.MaxValue; h = Long.MinValue }
    pushed.foreach {
      case GreaterThan("id", v: java.lang.Long) =>
        if (v == Long.MaxValue) markEmpty() else l = math.max(l, v + 1)
      case GreaterThanOrEqual("id", v: java.lang.Long) => l = math.max(l, v)
      case LessThan("id", v: java.lang.Long) =>
        if (v == Long.MinValue) markEmpty() else h = math.min(h, v - 1)
      case LessThanOrEqual("id", v: java.lang.Long)    => h = math.min(h, v)
      case EqualTo("id", v: java.lang.Long)            => l = math.max(l, v); h = math.min(h, v)
      case _ => ()
    }
    (l, h)
  }
  private val surviving: Array[Int] =
    (0 until pages).filter { p =>
      val first = p.toLong * pageSize
      val last = first + pageSize - 1
      last >= lo && first <= hi
    }.toArray

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftPagedScan pages=${surviving.length}/$pages pushed=[${pushed.mkString(", ")}] " +
      s"auth=${if (credential.isEmpty) "none" else PagedSource.Redacted}"
  override def planInputPartitions(): Array[InputPartition] =
    surviving.map(p => PagedPartition(p, pageSize): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required, credential)
}

class PagedReaderFactory(required: StructType, credential: String)
    extends PartitionReaderFactory {
  /** The live credential each "fetch" would present — intact here (it rides
    * executor serialization with the factory) even though no plan text ever
    * contains it. Spec-asserted.
    */
  private[graft] def liveCredential: String = credential
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PagedReader(p.asInstanceOf[PagedPartition], required)
}

class PagedReader(p: PagedPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < p.pageSize }
  override def get(): InternalRow = {
    val id = p.page.toLong * p.pageSize + i
    // materialize only the pruned columns, in the pruned order
    InternalRow.fromSeq(required.fields.map(_.name).toSeq.map {
      case "id"   => id
      case "page" => p.page
      case "body" => UTF8String.fromString(s"body-$id")
      case other  => throw new IllegalArgumentException(
        s"graft.sources.PagedSource has no column '$other' (columns: id, page, body)")
    })
  }
  override def close(): Unit = ()
}
