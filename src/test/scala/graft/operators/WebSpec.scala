package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Web.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq

  test("case, default port, www, fragment, tracking params, param order") {
    val out = canon(
      "https://www.Example.COM:443/a/b?b=2&a=1#frag",
      "HTTPS://example.com/a/b?a=1&utm_source=x&b=2",
      "https://example.com/a/b/?a=1&b=2",
      "https://example.com/a//b?utm_campaign=z&ref=h&b=2&a=1")
    assert(out.toSet == Set("https://example.com/a/b?a=1&b=2"))
  }

  test("http default port 80 stripped; non-default ports kept") {
    assert(canon("http://Host.org:80/x") == Seq("http://host.org/x"))
    assert(canon("http://host.org:8080/x") == Seq("http://host.org:8080/x"))
    assert(canon("https://host.org:80/x") == Seq("https://host.org:80/x"))
  }

  test("empty path becomes root; root trailing slash kept") {
    assert(canon("https://h.io") == Seq("https://h.io/"))
    assert(canon("https://h.io/") == Seq("https://h.io/"))
    assert(canon("https://h.io/x/") == Seq("https://h.io/x"))
  }

  test("all-tracking query collapses to no query") {
    assert(canon("https://h.io/p?utm_source=a&utm_medium=b&gclid=1")
      == Seq("https://h.io/p"))
  }

  test("canonicalization is idempotent") {
    val raw = Seq(
      "https://www.Example.COM:443/a//b/?b=2&utm_source=x&a=1#f",
      "http://h.io:80", "https://h.io/p?fbclid=z",
      // stacked www must strip fully in one pass (idempotence) and
      // land in the same dedup group as the bare host
      "https://www.www.h.io/p", "https://WWW.www.Example.com/x")
    assert(canon("https://www.www.h.io/p") == canon("https://h.io/p"))
    val once = canon(raw: _*)
    assert(canon(once: _*) == once)
  }

  test("urlDedup census: one shuffle, exact groups") {
    val docs = Seq(
      (1L, "https://www.h.io/p?b=2&a=1"),
      (2L, "HTTPS://H.IO:443/p?a=1&b=2#x"),
      (3L, "https://h.io/p/?a=1&utm_source=s&b=2"),
      (4L, "https://h.io/q")).toDF("doc_id", "url")
    val out = Web.urlDedup(docs, "url", "doc_id")
      .orderBy($"canonical_url").collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("https://h.io/p?a=1&b=2", "https://h.io/q"))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 4L))
    val shuffles = Web.urlDedup(docs, "url", "doc_id")
      .queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(shuffles <= 1)
  }
}
