package graft.sources

import graft.SparkSpec

class OtrParsersSpec extends SparkSpec {
  import spark.implicits._

  test("toplist parser extracts epg_id, rating, preview link and dd.MM.yy date") {
    val chunk =
      "<td><a href='?epg_id=4711'>Show</a> rating='sehr hoch' <img src='http://x/p.jpg'> 05.03.21</td>"
    val out = OtrParsers.parseToplist(Seq(chunk, "no id here").toDS())
      .select("epg_id", "rating", "previewimagelink", "PartitionKey", "RowKey")
      .as[(String, String, String, String, String)].collect()
    assert(out.length == 1)
    assert(out.head == (("4711", "sehr hoch", "http://x/p.jpg", "2021_03_05", "4711")))
  }

  test("tracker parser derives beginn/sender from filename tokens (from-end indexing)") {
    val chunk =
      "<a href='http://t/x_TVOON_DE.mpg.HD.avi.otrkey.torrent'>Tatort 21.03.05 20-15 DasErste 90</a>" +
        " finished=12 loading=3 loaded=7"
    val out = OtrParsers.parseTracker(Seq(chunk).toDS())
      .select("sender", "Resolution", "finished", "loading", "loaded")
      .as[(String, String, Int, Int, Int)].collect().head
    // fileparts from end: [-4]=21.03.05 [-3]=20-15 [-2]=DasErste→normalized
    assert(out == (("daserste", "HD", 12, 3, 7)))
    val ts = OtrParsers.parseTracker(Seq(chunk).toDS())
      .select($"beginn".cast("string")).as[String].collect().head
    assert(ts == "2021-03-05 20:15:00")
  }

  test("tracker parser: non-numeric counters default to 0 (F10)") {
    val chunk = "<a href='http://t/y_TVOON_DE.mpg.mp4.otrkey.torrent'>Show 21.03.05 20-15 zdf 45</a>" +
      " finished=abc"
    val out = OtrParsers.parseTracker(Seq(chunk).toDS())
      .select("finished", "loading", "loaded", "Resolution")
      .as[(Int, Int, Int, String)].collect().head
    assert(out == ((0, 0, 0, "MP4")))
  }
}
