package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** The paginated early-stop source: LIMIT pushdown must bound the pages
  * ever OPENED (the reference's stop-at-threshold fetch loop,
  * server/etl.py:126-159), not just the rows returned.
  */
class PageSourceSpec extends SparkSpec {
  import spark.implicits._

  private def stagePages(nPages: Int, perPage: Int): String = {
    val dir = Files.createTempDirectory("graft_pages")
    (0 until nPages).foreach { p =>
      val lines = (0 until perPage).map(i => s"row p$p i$i")
      Files.write(dir.resolve(f"page-$p%03d.txt"), String.join("\n", lines: _*).getBytes)
    }
    dir.toString
  }

  private def readPages(dir: String) = spark.read
    .format("graft.sources.PageSource")
    .option("path", dir).option("pageSize", "4").load()

  test("limit(n) plans only ceil(n/pageSize) pages and opens no more") {
    val dir = stagePages(nPages = 5, perPage = 4)
    PageSource.pagesOpened.set(0)
    val got = readPages(dir).limit(10)
      .select("page", "pos", "chunk").as[(Int, Int, String)].collect()
    assert(got.length == 10)
    assert(PageSource.pagesOpened.get() == 3,
      s"limit 10 over 4-row pages must open exactly 3 pages, opened ${PageSource.pagesOpened.get()}")
    // the pushed limit is visible in the scan
    val plan = readPages(dir).limit(10).queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=10"), s"plan must show the pushed limit:\n$plan")
  }

  test("rows are the page lines in (page, pos) order, full read opens all pages") {
    val dir = stagePages(nPages = 3, perPage = 4)
    PageSource.pagesOpened.set(0)
    // sort client-side: a distributed orderBy adds a range-partitioning
    // sampling pass that legitimately reads each page a second time
    val got = readPages(dir)
      .as[(Int, Int, String)].collect().toSeq.sorted
    assert(got.size == 12)
    assert(PageSource.pagesOpened.get() == 3)
    assert(got.head == ((0, 0, "row p0 i0")))
    assert(got.last == ((2, 3, "row p2 i3")))
  }

  test("threshold early stop ≡ monotone filter + limit: parser runs only on fetched pages") {
    // rank is monotone in (page, pos) — the reference's 'stop once rating
    // drops below threshold' loop is exactly this shape
    val dir = stagePages(nPages = 5, perPage = 4)
    PageSource.pagesOpened.set(0)
    val kept = readPages(dir).limit(6)   // threshold reached inside page 2
    assert(kept.count() == 6)
    assert(PageSource.pagesOpened.get() == 2)
  }

  test("a short FINAL page is legal (feed exhausted)") {
    val dir = stagePages(nPages = 2, perPage = 4)
    // rewrite the last page short — the protocol's exhaustion signal
    Files.write(java.nio.file.Paths.get(dir, "page-001.txt"), "row p1 i0".getBytes)
    assert(readPages(dir).count() == 5)
  }

  test("a short NON-final page fails loudly instead of silently under-delivering a limit") {
    val dir = stagePages(nPages = 3, perPage = 4)
    Files.write(java.nio.file.Paths.get(dir, "page-001.txt"), "row p1 i0".getBytes)
    // limit 12 plans 3 pages; the short middle page would deliver 9 < 12
    // with no way to recover (later pages were never planned) — the
    // reader must refuse rather than return a silently-short prefix
    val ex = intercept[org.apache.spark.SparkException] {
      readPages(dir).limit(12).collect()
    }
    assert(ex.getMessage.contains("protocol violation")
      || Option(ex.getCause).exists(_.getMessage.contains("protocol violation")))
  }
}
