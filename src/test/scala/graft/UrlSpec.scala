package graft

import org.apache.spark.sql.functions._

import graft.operators.Url

/** URL canonicalization / registrable-domain / domain-cap semantics. */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Url.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("canonicalize: case, default ports, tracking params, order, fragment") {
    // all six raw forms name the same resource -> ONE canonical string
    val got = canon(
      "https://Example.COM/a/b?id=1&utm_source=x",
      "HTTPS://example.com:443/a/b?id=1",
      "https://example.com/a/b/?id=1#frag",
      "https://example.com/a/b?utm_campaign=spring&id=1&gclid=zzz",
      "https://example.com/a/b?id=1&fbclid=abc",
      "  https://example.com/a/b?id=1  ")
    got.distinct shouldBe Seq("https://example.com/a/b?id=1")
  }

  test("canonicalize: surviving params sort; non-default port survives") {
    canon("https://example.com/p?b=2&a=1") shouldBe
      Seq("https://example.com/p?a=1&b=2")
    canon("http://example.com:8080/p") shouldBe Seq("http://example.com:8080/p")
    // :443 is only default for https — it survives on http
    canon("http://example.com:443/p") shouldBe Seq("http://example.com:443/p")
    canon("http://example.com:80/p") shouldBe Seq("http://example.com/p")
    // no query at all -> no '?'
    canon("https://example.com/p?utm_source=x") shouldBe
      Seq("https://example.com/p")
  }

  test("registrableDomain: two-level public suffixes take three labels") {
    val got = Seq("news.example.co.uk", "a.b.example.com", "example.com",
      "example.co.uk", "localhost", "cdn.site.org")
      .toDF("h").select(Url.registrableDomain(col("h"))).collect()
      .map(_.getString(0)).toSeq
    got shouldBe Seq("example.co.uk", "example.com", "example.com",
      "example.co.uk", "localhost", "site.org")
  }

  test("registrableDomain: full PSL — multi-level ccTLDs, private suffixes") {
    val cases = Seq(
      "shop.example.com.cn" -> "example.com.cn",
      "a.b.example.com.tr" -> "example.com.tr",
      "docs.portal.co.il" -> "portal.co.il",
      // private-section rule: every GitHub Pages tenant is its own party
      "user1.github.io" -> "user1.github.io",
      "pages.user2.github.io" -> "user2.github.io",
      // *.ck wildcard: 'foo.ck' is itself a public suffix
      "a.b.cdn.foo.ck" -> "cdn.foo.ck",
      // !www.ck exception: www.ck IS registrable despite *.ck
      "www.ck" -> "www.ck",
      "sub.www.ck" -> "www.ck",
      // host that IS a public suffix -> returned unchanged (never null)
      "co.uk" -> "co.uk",
      "github.io" -> "github.io",
      // no PSL rule at all -> last two labels
      "a.b.internal-zone" -> "b.internal-zone")
    val got = cases.map(_._1)
      .toDF("h").select(Url.registrableDomain(col("h"))).collect()
      .map(_.getString(0)).toSeq
    got shouldBe cases.map(_._2)
  }

  test("dedupByCanonicalUrl: tracking variants collapse; survivor = min id") {
    val df = Seq(
      (1L, "https://Example.com/x?id=1&utm_source=a"),
      (2L, "https://example.com/x/?id=1&gclid=b"),
      (3L, "https://example.com/y?id=2")
    ).toDF("doc_id", "url")
    val got = Url.dedupByCanonicalUrl(df, "url", "doc_id").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got("https://example.com/x?id=1") shouldBe ((2L, 1L))
    got("https://example.com/y?id=2") shouldBe ((1L, 3L))
  }

  test("domainCap: at most cap per registrable domain, deterministic pick") {
    val df = (1 to 40).map(i => (i.toLong,
      s"https://sub$i.example.co.uk/p$i")).toDF("doc_id", "url")
    val kept = Url.domainCap(df, "url", "doc_id", cap = 5)
    kept.count() shouldBe 5L
    kept.select("domain").distinct().head().getString(0) shouldBe "example.co.uk"
    // same pick on re-run (hash order, not scan order)
    val again = Url.domainCap(df, "url", "doc_id", cap = 5)
      .collect().map(_.getLong(0)).toSet
    kept.collect().map(_.getLong(0)).toSet shouldBe again
    an[IllegalArgumentException] should be thrownBy
      Url.domainCap(df, "url", "doc_id", cap = 0)
  }

  test("domainBlocklistFilter: kills listed registrable domains only") {
    val df = Seq(
      (1L, "https://news.example.co.uk/a"),
      (2L, "https://blog.spam-farm.com/b?utm_source=x"),
      (3L, "https://ok.example.com/c"),
      (4L, "http://SPAM-FARM.com:80/d")
    ).toDF("doc_id", "url")
    val kept = Url.domainBlocklistFilter(df, "url", Seq("spam-farm.com"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 3L)
    an[IllegalArgumentException] should be thrownBy
      Url.domainBlocklistFilter(df, "url", Seq.empty)
  }
}
