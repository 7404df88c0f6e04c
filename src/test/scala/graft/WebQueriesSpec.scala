package graft

import org.apache.spark.sql.functions._

/** Edge cases for the URL canonicalizer that the synthesized corpus
  * (WebQueries.withRawUrl) does not exercise — the gated queries prove
  * the happy paths against the first-principles oracle; this spec
  * pins the corners a real crawl hits. */
class WebQueriesSpec extends SparkSuite {
  import spark.implicits._

  private def canon(urls: String*): Map[String, String] =
    graft.operators.WebQueries.canonicalized(
      urls.toSeq.toDF("url_raw"))
      .select($"url_raw", $"url_canon")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("http default port 80 is stripped; non-default kept") {
    val c = canon(
      "HTTP://Example.COM:80/x",
      "http://example.com:8080/x",
      "https://example.com:443/x",
      "https://example.com:80/x")  // 80 is NOT https' default
    assert(c("HTTP://Example.COM:80/x") === "http://example.com/x")
    assert(c("http://example.com:8080/x") ===
      "http://example.com:8080/x")
    assert(c("https://example.com:443/x") === "https://example.com/x")
    assert(c("https://example.com:80/x") === "https://example.com:80/x")
  }

  test("empty and root paths canonicalize to '/'") {
    val c = canon(
      "http://a.com",
      "http://a.com/",
      "http://a.com///",
      "http://a.com?x=1",
      "http://a.com/#frag")
    assert(c("http://a.com") === "http://a.com/")
    assert(c("http://a.com/") === "http://a.com/")
    assert(c("http://a.com///") === "http://a.com/")
    assert(c("http://a.com?x=1") === "http://a.com/?x=1")
    assert(c("http://a.com/#frag") === "http://a.com/")
  }

  test("tracking params (utm_*, fbclid, gclid) drop; rest sort") {
    val c = canon(
      "http://a.com/p?z=9&utm_medium=em&a=1&fbclid=abc&gclid=x&b=2",
      "http://a.com/p?b=2&a=1&z=9")
    // both raws land on the same canon — the dedup property itself
    assert(c.values.toSet === Set("http://a.com/p?a=1&b=2&z=9"))
  }

  test("www. strips only as a PREFIX label; inner www survives") {
    val c = canon(
      "http://www.a.com/x",
      "http://wwwa.com/x",       // no dot — not the www label
      "http://a.www.com/x")      // www not the first label
    assert(c("http://www.a.com/x") === "http://a.com/x")
    assert(c("http://wwwa.com/x") === "http://wwwa.com/x")
    assert(c("http://a.www.com/x") === "http://a.www.com/x")
  }

  test("trailing slashes strip but inner structure is preserved") {
    val c = canon(
      "http://a.com/x/y///",
      "http://a.com//x//y/z")
    assert(c("http://a.com/x/y///") === "http://a.com/x/y")
    assert(c("http://a.com//x//y/z") === "http://a.com/x/y/z")
  }

  test("registered domain is the last two labels of the canon host") {
    val d = graft.operators.WebQueries.canonicalized(
      Seq("http://www.deep.sub.sample.co/x").toDF("url_raw"))
      .select($"domain").head.getString(0)
    assert(d === "sample.co")
  }

  test("path case is preserved; only scheme+host fold") {
    val c = canon("HTTPS://A.Com/Mixed/Case?Q=V")
    assert(c("HTTPS://A.Com/Mixed/Case?Q=V") ===
      "https://a.com/Mixed/Case?Q=V")
  }

  test("canonicalization is idempotent over the whole corpus") {
    // THE canonicalizer property: a canonical URL re-fed as raw input
    // must map to itself (no junk left for a second pass to strip).
    // Checked over every synthesized URL, not a hand-picked sample.
    val c1 = graft.operators.WebQueries.canonicalized(
      graft.operators.WebQueries.withRawUrl(
        spark.read.parquet(sf() + "/documents.parquet")))
      .select($"url_canon")
    val c2 = graft.operators.WebQueries.canonicalized(
      c1.withColumnRenamed("url_canon", "url_raw"))
    assert(c2.filter($"url_canon" =!= $"url_raw").count() === 0L)
  }

  test("synthesized corpus: distinct raws collide on canon groups") {
    val df = graft.operators.WebQueries.canonicalized(
      graft.operators.WebQueries.withRawUrl(
        spark.read.parquet(sf() + "/documents.parquet")))
    val (nRaw, nCanon) = (
      df.select("url_raw").distinct.count(),
      df.select("url_canon").distinct.count())
    // junk axes multiply raw variants well beyond the canonical space
    assert(nCanon < nRaw,
      s"expected canon collisions: raw=$nRaw canon=$nCanon")
    // canonical space is bounded by the mod-19/23/7 construction
    assert(nCanon <= 19L * 23 * 7)
  }

  test("corpus assumption pin: document text is ASCII with no '<'") {
    // The html-family oracles (web_html_text / web_links /
    // web_boilerplate) compute link counts and block metrics from
    // first principles, which is sound only while the corpus text
    // cannot inject markup of its own or change the char-vs-byte
    // length relation. Fail LOUDLY if a testdata change breaks that.
    val d = spark.read.parquet(sf() + "/documents.parquet")
    assert(d.filter($"text".contains("<")).count() === 0L)
    assert(d.filter(octet_length($"text") =!= length($"text"))
      .count() === 0L)
  }

  test("boilerplate segmentation: a handcrafted page scores exactly") {
    // unit form of the web_boilerplate gate: one page, known blocks
    val rows = graft.operators.WebQueries.htmlBlocked(
      Seq((4L, "x" * 60)).toDF("doc_id", "text"))
      .select($"doc_id", posexplode(expr(
        "regexp_extract_all(html, '<(nav|p|footer)>(?s:.*?)</\\\\1>', 0)")))
      .withColumn("inner", regexp_replace($"col", "<[^>]*>", ""))
      .collect()
    assert(rows.length === 4) // nav, main, promo (doc 4 is even), footer
    val inner = rows.map(_.getString(3))
    assert(inner(0) === "Home | About")
    assert(inner(1) === "x" * 60)
    assert(inner(2) === "Read more on site 4 today")
    assert(inner(3) === "(c) 2026")
  }
}
