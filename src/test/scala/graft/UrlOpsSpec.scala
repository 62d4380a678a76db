package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** URL canonicalization rule-by-rule, plus host/domain derivation. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalUrl($"u")).as[String].collect().toSeq

  test("canonical rules: case, ports, www, tracking, sort, slash, fragment") {
    assert(canon("HTTP://WWW.Ex.COM:80/A/b/?utm_source=x&b=2&a=1#f")
      == Seq("http://ex.com/A/b?a=1&b=2"), "path case is preserved, host case is not")
    assert(canon("https://ex.com:443/x") == Seq("https://ex.com/x"))
    assert(canon("https://ex.com:8443/x") == Seq("https://ex.com:8443/x"),
      "non-default port survives")
    assert(canon("http://ex.com:443/x") == Seq("http://ex.com:443/x"),
      "443 is not http's default")
    assert(canon("ex.com/p///") == Seq("http://ex.com/p"), "schemeless + slashes")
    assert(canon("http://ex.com/") == Seq("http://ex.com"), "root collapses")
    assert(canon("http://ex.com/?utm_a=1&utm_b=2&ref=r&fbclid=z")
      == Seq("http://ex.com"), "all-tracking query vanishes")
    assert(canon("http://ex.com/?refresh=1") == Seq("http://ex.com?refresh=1"),
      "ref= filter must not eat ref-prefixed param names")
    assert(canon(" http://ex.com/x ") == Seq("http://ex.com/x"), "trimmed")
  }

  test("host and registrable domain: eTLD+1 approximation, IPs whole") {
    val rows = Seq(
      "https://a.b.shop.example.co.uk/x",
      "http://www.example.com:80/y",
      "http://10.1.2.3:8080/z",
      "http://localhost/w").toDF("u")
      .select(UrlOps.host($"u").as("h"))
      .select($"h", UrlOps.registrableDomain($"h").as("d"))
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(
      ("a.b.shop.example.co.uk", "example.co.uk"),
      ("example.com", "example.com"),
      ("10.1.2.3", "10.1.2.3"),
      ("localhost", "localhost")))
  }

  test("canonicalization is a zero-shuffle projection") {
    val df = Seq("http://ex.com/a").toDF("u")
      .select(UrlOps.canonicalUrl($"u"), UrlOps.host($"u"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
  }
}
