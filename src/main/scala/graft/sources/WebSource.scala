package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 connector for the synthetic web — the "remote paginated
 * source" as a first-class Spark table with REAL pushdown (SURVEY.md §4:
 * "Catalyst cannot early-stop a remote source — implement ... a
 * SupportsPushDownLimit DSv2 source"):
 *
 *   spark.read.format("graft.sources.WebSource")
 *     .option("scale", "1000").option("limit_per_site", "100")
 *     .load()
 *     .filter($"site_id" === "biz.ssu.ac.kr")   // -> site pruning (planning!)
 *     .limit(500)                                // -> page-fetch budget
 *
 * Pushdown semantics:
 *  - `site_id = X` / `site_id IN (...)` prunes whole sites at PLANNING
 *    time — unselected sites get no input partitions at all (the
 *    include/exclude semi-join J4 done inside the source);
 *  - LIMIT N caps the per-partition page walk: a partition stops
 *    generating once it has produced its share — the reference's
 *    take(remain)/stop-on-limit loop (gnuboard mod.rs:92-108) expressed
 *    as connector-level limit pushdown;
 *  - one input partition per (site, page-range) — the natural fetch
 *    parallelism unit.
 */
class WebSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WebSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WebTable(
      properties.getOrDefault("scale", "1000").toLong,
      properties.getOrDefault("limit_per_site", "100").toLong,
      properties.getOrDefault("rev", "0").toInt)
}

object WebSource {
  val schema: StructType = StructType(Seq(
    StructField("site_id", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("content", StringType, nullable = false)))
}

private class WebTable(scale: Long, limitPerSite: Long, rev: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_web(scale=$scale)"
  override def schema(): StructType = WebSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WebScanBuilder(scale, limitPerSite, rev)
}

private class WebScanBuilder(scale: Long, limitPerSite: Long, rev: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownLimit {

  private var siteFilter: Option[Set[String]] = None
  private var pushedLimit: Option[Int] = None
  private var pushed: Array[Filter] = Array.empty

  private def narrowTo(vs: Set[String]): Unit =
    siteFilter = Some(siteFilter.fold(vs)(_ intersect vs))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("site_id", _: String) => true
      case In("site_id", _)              => true
      case _                             => false
    }
    // successive site_id constraints INTERSECT (filters are conjunctive):
    // `site_id = 'a' AND site_id IN ('a','b')` must prune to {'a'}, not
    // let the last-seen filter win
    accepted.foreach {
      case EqualTo("site_id", v: String) => narrowTo(Set(v))
      case In("site_id", vs)             => narrowTo(vs.map(_.toString).toSet)
      case _                             =>
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit)
    true // fully handled: the page walk stops at the budget
  }

  override def build(): Scan = new WebScan(scale, limitPerSite, rev, siteFilter, pushedLimit)
}

private class WebScan(scale: Long, limitPerSite: Long, rev: Int,
    siteFilter: Option[Set[String]], pushedLimit: Option[Int])
  extends Scan with Batch {

  override def readSchema(): StructType = WebSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_web sites=${siteFilter.map(_.mkString(",")).getOrElse("*")} " +
      s"pushedLimit=${pushedLimit.getOrElse(-1)}"

  override def planInputPartitions(): Array[InputPartition] = {
    // site pruning happens HERE — at planning time
    val sites = graft.crawl.Sites.all
      .filter(_.family != "calendar")
      .filter(s => siteFilter.forall(_.contains(s.site_id)))
    // a LIMIT budget is split across sites up front (breadth fairness);
    // each partition knows exactly how many posts it may fetch
    val perSiteCap = pushedLimit match {
      case Some(l) if sites.nonEmpty =>
        math.max(1L, (l + sites.size - 1L) / sites.size).min(limitPerSite)
      case _ => limitPerSite
    }
    sites.map(s => WebPartition(s.site_id, perSiteCap, scale, rev): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new WebReaderFactory
}

private case class WebPartition(siteId: String, cap: Long, scale: Long, rev: Int)
  extends InputPartition

private class WebReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[
    org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[WebPartition]
    new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      private val site = graft.crawl.SyntheticWeb.siteById(p.siteId)
      private val total0 = graft.crawl.Sites.postCount(site, p.scale)
      private val visible = if (p.rev >= 1) total0 else total0 - total0 / 23
      private val wanted = math.min(visible, p.cap)
      private var produced = 0L
      private var row: org.apache.spark.sql.catalyst.InternalRow = _

      override def next(): Boolean = {
        if (produced >= wanted) return false // limit pushdown: STOP fetching
        val post = graft.crawl.SyntheticWeb.fetchPost(
          site, visible - produced, p.rev, graft.crawl.Crawl.DefaultSeed)
        row = org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(post.site_id),
          UTF8String.fromString(post.id),
          UTF8String.fromString(post.url),
          UTF8String.fromString(post.title),
          post.created_at.getTime * 1000L, // micros
          UTF8String.fromString(post.content))
        produced += 1
        true
      }
      override def get(): org.apache.spark.sql.catalyst.InternalRow = row
      override def close(): Unit = ()
    }
  }
}
