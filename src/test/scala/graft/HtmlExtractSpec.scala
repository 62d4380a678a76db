package graft

import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract

/** HTML → main-content extraction: noise stripping, entity decode
  * order, the block link-density/length rules, and plan shape. */
class HtmlExtractSpec extends SparkSpec {

  private lazy val sc = spark

  test("script/style payloads and comments never leak into text") {
    import sc.implicits._
    val html = "<html><head><style>p{color:red}</style>" +
      "<script>var leak = 'secret';</script></head>" +
      "<body><!-- hidden note --><p>visible paragraph body text here ok</p>" +
      "</body></html>"
    val out = HtmlExtract.mainContent(Seq((1L, html)).toDF("id", "html"),
      "html", "id", minChars = 10).collect().head
    assert(out.getString(3) == "visible paragraph body text here ok")
    assert(!out.getString(3).contains("secret") &&
      !out.getString(3).contains("hidden") &&
      !out.getString(3).contains("color"))
  }

  test("entity decode: after tag strip, &amp; last, escaped markup is content") {
    import sc.implicits._
    val html = "<p>a &lt;b&gt; c &amp;lt; d &quot;q&#39;s&quot; &nbsp; e</p>"
    val blocks = HtmlExtract.blocks(Seq((1L, html)).toDF("id", "html"),
      "html", "id").collect()
    assert(blocks.length == 1)
    // &amp;lt; decodes ONE level to "&lt;" (amp applied last); the
    // decoded <b> does not get stripped (it was content, not structure)
    assert(blocks.head.getString(2) == "a <b> c &lt; d \"q's\" e")
  }

  test("nav dropped by link density, chrome by length, order preserved") {
    import sc.implicits._
    val html = "<div><a href='/'>home</a> <a href='/x'>about</a></div>" +
      "<p>first real paragraph with enough characters in it</p>" +
      "<div>ft</div>" +
      "<p>second real paragraph also long enough to keep around</p>"
    val out = HtmlExtract.mainContent(Seq((1L, html)).toDF("id", "html"),
      "html", "id").collect().head
    assert(out.getLong(1) == 4L && out.getLong(2) == 2L)
    assert(out.getString(3) ==
      "first real paragraph with enough characters in it " +
        "second real paragraph also long enough to keep around")
  }

  test("link density measures anchor share; mixed block survives under cap") {
    import sc.implicits._
    val mixed = "<p>a sentence with plenty of ordinary prose around " +
      "<a href='/r'>one link</a> inside it somewhere</p>"
    val b = HtmlExtract.blocks(Seq((1L, mixed)).toDF("id", "html"),
      "html", "id").collect().head
    assert(b.getLong(4) > 0L, "anchor chars counted")
    assert(b.getDouble(5) < 0.33, s"density ${b.getDouble(5)}")
    val out = HtmlExtract.mainContent(Seq((1L, mixed)).toDF("id", "html"),
      "html", "id").collect().head
    assert(out.getLong(2) == 1L, "mixed block kept")
    assert(out.getString(3).contains("one link"), "anchor text is content")
  }

  test("links: hrefs in order, noise-element hrefs excluded") {
    import sc.implicits._
    val html = "<body><!-- <a href='/ghost'>x</a> -->" +
      "<script>var s = '<a href=\"/scripted\">y</a>';</script>" +
      "<a href=\"http://a.com/1\">one</a>" +
      "<p>text</p><a href='/rel'>two</a>" +
      "<A HREF='https://B.com/2'>THREE</A></body>"
    val out = HtmlExtract.links(Seq((1L, html)).toDF("id", "html"), "html", "id")
      .orderBy($"pos").select($"url").as[String].collect().toSeq
    assert(out == Seq("http://a.com/1", "/rel", "https://B.com/2"),
      s"got $out")
  }

  test("malformed html degrades, never errors; zero-shuffle plan") {
    import sc.implicits._
    val df = Seq(
      (1L, "<p>unclosed paragraph but fine words keep flowing along"),
      (2L, "no tags at all just plain text long enough to keep here"),
      (3L, "")).toDF("id", "html")
    val mc = HtmlExtract.mainContent(df, "html", "id")
    val rows = mc.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(2) == 1L && rows(2L).getLong(2) == 1L)
    assert(rows(3L).getLong(1) == 0L && rows(3L).getString(3) == "")
    val plan = mc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"),
      s"mainContent must be one zero-shuffle projection:\n${plan.take(800)}")
  }
}
