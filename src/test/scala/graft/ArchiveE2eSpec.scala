package graft

import org.apache.spark.sql.functions._

/** The round-14 capstone plan: write a directory of real .warc.gz
  * archives, read it back through `Warc.warcFiles`, and route every
  * record in one projection — redirect edges, magic-byte MIME
  * override of a lying Content-Type, charset decode + boilerplate
  * strip, SURT index keys. The spec pins the routing PRECEDENCE
  * (status beats sniff beats page) and the exact routed fields. */
class ArchiveE2eSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val out = {
    val df = SparkEntry.queries("q_archive_e2e")(spark, sf)
    df.cache()
    df.count()
    df
  }

  test("every capture routes exactly once, by doc_id arm") {
    val docs = Tables.load(spark, sf, "documents").count()
    assert(out.count() == docs)
    val byKind = out.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.keySet == Set("page", "redirect", "binary"))
    assert(byKind.values.sum == docs)
    // the three arms are doc_id % 3 — verify the routing matches
    val wrong = out.filter(
      (col("doc_id") % 3 === 0 && col("kind") =!= "page") ||
      (col("doc_id") % 3 === 1 && col("kind") =!= "redirect") ||
      (col("doc_id") % 3 === 2 && col("kind") =!= "binary")).count()
    assert(wrong == 0)
  }

  test("binary arm: %PDF magic overrides the lying text/html header") {
    val bin = out.filter(col("kind") === "binary")
    assert(bin.filter(col("sniffed_mime") =!= "application/pdf")
      .count() == 0)
    // and it never leaks main_text or a redirect edge
    assert(bin.filter(col("main_text").isNotNull ||
      col("redirect_to").isNotNull).count() == 0)
  }

  test("redirect arm: relative Location resolves + canonicalizes") {
    val r = out.filter(col("kind") === "redirect" && col("doc_id") === 1)
      .select("redirect_to", "surt_key").head()
    assert(r.getString(0).startsWith("https://"))
    assert(r.getString(0).endsWith(".example.com/moved/1"))
    assert(r.getString(1).startsWith("com,example,"))
    assert(r.getString(1).endsWith(")/doc/1"))
  }

  test("page arm: windows-1250 decode + boilerplate strip are exact") {
    val t = out.filter(col("kind") === "page" && col("doc_id") === 0)
      .select("main_text").head().getString(0)
    // the link-only nav div is dropped; the content paragraph stays,
    // with the windows-1250 bytes decoded back to the literal
    assert(t == "Doc 0 carries this perfectly ordinary content " +
      "paragraph Żółć")
    assert(!t.contains("Home") && !t.contains("About"))
  }
}
