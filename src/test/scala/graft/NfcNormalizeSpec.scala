package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, NfcNormalize}

/** Native NFC normalization expression: pinned Unicode semantics, null
  * handling, codegen compilation, and the identity fast path. */
class NfcNormalizeSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def nfcOne(s: String): String = {
    GraftExtensions.register(spark)
    Seq(s).toDF("t").select(NfcNormalize.nfcCol(col("t"))).as[String]
      .collect().head
  }

  test("combining sequences compose; compatibility singletons map") {
    assert(nfcOne("éclair") == "éclair")          // e+acute -> é
    assert(nfcOne("angèle") == "angèle")          // e+grave -> è
    assert(nfcOne("Å") == "Å")                     // ANGSTROM -> Å
    assert(nfcOne("ą́") == nfcOne("ą́")) // canonical reorder
  }

  test("already-NFC text passes through unchanged (incl. non-ASCII)") {
    for (s <- Seq("plain ascii", "café déjà", "", "日本語"))
      assert(nfcOne(s) == s)
  }

  test("nulls stay null; codegen compiles with fallback disabled") {
    GraftExtensions.register(spark)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq(Some("é"), None, Some("x")).toDF("t")
        .select(NfcNormalize.nfcCol(col("t")).as("n"))
        .as[Option[String]].collect().toSeq
      assert(out == Seq(Some("é"), None, Some("x")))
      // SQL registration path
      val viaSql = spark.sql("SELECT graft_nfc('éclair') AS n")
        .as[String].collect().head
      assert(viaSql == "éclair")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("normalization canonicalizes dedup keys that raw bytes miss") {
    // the operational point: decomposed and precomposed spellings must
    // collapse to ONE digest after normalization
    GraftExtensions.register(spark)
    val df = Seq((1L, "café"), (2L, "café")).toDF("doc_id", "text")
    val rawKeys = df.select(sha2(col("text"), 256)).distinct().count()
    val nfcKeys = df.select(sha2(NfcNormalize.nfcCol(col("text")), 256))
      .distinct().count()
    assert(rawKeys == 2L && nfcKeys == 1L)
  }
}
