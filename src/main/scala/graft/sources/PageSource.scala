package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Paginated ordered page source with LIMIT pushdown (SURVEY §7.4
  * phase 2) — the DataSource V2 form of the reference's page-by-page
  * scrape loop with early termination (`server/etl.py:123-159,174-244`:
  * pages of 20/50 rows are fetched in rank order and the loop stops at
  * the first row past the rank/ctime threshold).
  *
  * The monotone thresholds make the early stop ≡ `filter + LIMIT`, so
  * the whole early-termination protocol compiles to
  * [[SupportsPushDownLimit]]: `read.format(...).load().limit(n)` plans
  * only `ceil(n / pageSize)` page partitions — later pages are never
  * opened, exactly like the reference never issues their HTTP GETs.
  *
  * Input layout: a directory of staged page files `page-*.txt` (one row
  * per line, `pageSize` rows per full page), named in rank order — the
  * post-fetch shape produced by the driver-side staging fetcher
  * ([[LenientCsv.fetchToStaging]]). Output: `(page, pos, chunk)` rows
  * for [[OtrParsers]].
  *
  * Usage: `spark.read.format("graft.sources.PageSource")
  *   .option("path", dir).option("pageSize", "20").load()`
  */
class PageSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PageSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new PageTable(properties.get("path"),
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(20))
}

object PageSource {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("chunk", StringType)))

  /** Pages opened by readers in this JVM — observability for the
    * early-stop contract (the spec asserts fetch stops at the threshold
    * page; a real deployment would use a metric).
    */
  val pagesOpened = new AtomicInteger(0)
}

final class PageTable(path: String, pageSize: Int) extends Table with SupportsRead {
  require(path != null, "PageSource requires .option(\"path\", ...)")
  override def name: String = s"graft_pages($path)"
  override def schema: StructType = PageSource.schema
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PageScanBuilder(path, pageSize)
}

final class PageScanBuilder(path: String, pageSize: Int)
    extends ScanBuilder with SupportsPushDownLimit {
  private var limit = Int.MaxValue
  /** Returning false = partially pushed: the scan still uses the limit
    * to bound which pages are PLANNED (the early-stop), but Spark keeps
    * its own Limit on top — so a page that violates the fixed-pageSize
    * protocol by running short can never cause silent over-delivery.
    * (A short page means the feed is exhausted in the reference
    * protocol — pages are fixed-size except the last — so the planned
    * prefix still covers the limit whenever the protocol holds.)
    */
  override def pushLimit(n: Int): Boolean = { limit = n; false }
  override def build(): Scan = new PageScan(path, pageSize, limit)
}

final class PageScan(path: String, pageSize: Int, limit: Int) extends Scan with Batch {
  override def readSchema: StructType = PageSource.schema
  override def toBatch: Batch = this
  override def description: String =
    s"GraftPageScan(path=$path, pageSize=$pageSize, " +
      s"pushedLimit=${if (limit == Int.MaxValue) "none" else limit})"

  /** One partition per NEEDED page: the pushed limit bounds the page
    * count up front — the early-stop. Page i's row budget caps the total
    * at the limit even mid-page.
    *
    * The page-count bound assumes every non-final page holds exactly
    * `pageSize` rows (the reference protocol: only the LAST page may run
    * short). A short non-final page would make the planned prefix
    * under-deliver the pushed limit with no way to recover (later pages
    * were never planned) — so the reader ASSERTS the protocol and fails
    * loudly on a short non-final page instead of silently dropping rows.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val pages = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("page-") && f.getName.endsWith(".txt"))
      .sortBy(_.getName)
    val needed =
      if (limit == Int.MaxValue) pages.length
      else math.min(pages.length, (limit + pageSize - 1) / pageSize)
    pages.take(needed).zipWithIndex.map { case (f, i) =>
      val budget =
        if (limit == Int.MaxValue) Int.MaxValue
        else math.min(pageSize, limit - i * pageSize)
      // final = last file present in the DIRECTORY, not last planned:
      // a planned prefix page is only allowed to run short if it is
      // genuinely the feed's last page
      PagePartition(f.getAbsolutePath, i, budget, pageSize,
        isFinal = i == pages.length - 1): InputPartition
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = new PageReaderFactory
}

final case class PagePartition(file: String, page: Int, budget: Int,
                               pageSize: Int, isFinal: Boolean) extends InputPartition

final class PageReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PageReader(p.asInstanceOf[PagePartition])
}

final class PageReader(p: PagePartition) extends PartitionReader[InternalRow] {
  private val lines: Iterator[(String, Int)] = {
    PageSource.pagesOpened.incrementAndGet()
    val all = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p.file)).asScala
    // protocol assertion (see planInputPartitions): a short NON-final
    // page silently under-delivers a pushed limit — fail loudly instead
    if (!p.isFinal && all.size != p.pageSize)
      throw new IllegalStateException(
        s"PageSource protocol violation: non-final page ${p.file} has " +
          s"${all.size} rows, expected exactly ${p.pageSize}")
    all.iterator.take(p.budget).zipWithIndex
  }
  private var current: (String, Int) = _
  override def next(): Boolean = { val has = lines.hasNext; if (has) current = lines.next(); has }
  override def get(): InternalRow = new GenericInternalRow(
    Array[Any](p.page, current._2, UTF8String.fromString(current._1)))
  override def close(): Unit = ()
}
