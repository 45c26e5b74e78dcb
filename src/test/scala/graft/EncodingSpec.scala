package graft

import java.nio.charset.Charset

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Encoding

/** WHATWG encoding-sniffing order pinned for the `charset_decode`
  * oracle. */
class EncodingSpec extends AnyFunSuite {

  private val cp1252 = Charset.forName("windows-1252")
  private val latin1 = Charset.forName("iso-8859-1")

  test("BOM wins over everything, and is stripped") {
    val utf8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "café €".getBytes("UTF-8")
    assert(Encoding.decode(utf8, "iso-8859-1") == ("café €", "utf-8", "bom"))
    val u16le = Array(0xFF, 0xFE).map(_.toByte) ++
      "page".getBytes("UTF-16LE")
    assert(Encoding.decode(u16le, "") == ("page", "utf-16le", "bom"))
    val u16be = Array(0xFE, 0xFF).map(_.toByte) ++
      "page".getBytes("UTF-16BE")
    assert(Encoding.decode(u16be, "") == ("page", "utf-16be", "bom"))
  }

  test("transport declaration beats meta prescan; aliases normalize") {
    val b = "<meta charset=utf-8>café €".getBytes(cp1252)
    assert(Encoding.decode(b, "windows-1252") ==
      ("<meta charset=utf-8>café €", "windows-1252", "declared"))
    assert(Encoding.decode("café".getBytes(latin1), "LATIN-1")._2 ==
      "iso-8859-1")
    // unknown declared charset falls through to the next stage
    assert(Encoding.decode("plain".getBytes("UTF-8"), "bogus-9000") ==
      ("plain", "utf-8", "utf8"))
  }

  test("meta prescan reads the first 1024 bytes as ASCII superset") {
    val b = "<html><META CHARSET=\"ISO-8859-1\"><body>café".getBytes(latin1)
    assert(Encoding.decode(b, "") ==
      ("<html><META CHARSET=\"ISO-8859-1\"><body>café", "iso-8859-1", "meta"))
  }

  test("strict utf-8 validates; malformed bytes fall back to cp1252") {
    assert(Encoding.decode("valid é ≤".getBytes("UTF-8"), "") ==
      ("valid é ≤", "utf-8", "utf8"))
    val bare = "café €".getBytes(cp1252) // 0xE9, 0x80: invalid UTF-8
    assert(Encoding.decode(bare, "") == ("café €", "windows-1252", "fallback"))
    assert(Encoding.decode(Array.emptyByteArray, "") ==
      ("", "utf-8", "utf8"), "empty bytes are trivially valid UTF-8")
  }

  test("decodeRows: typed map emits (text, charset, how)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq(
      (1L, "café".getBytes(cp1252), "windows-1252"),
      (2L, "ok".getBytes("UTF-8"), "")
    ).toDF("doc_id", "blob", "declared")
    val rows = Encoding.decodeRows(df, "doc_id", "blob", "declared")
      .as[(Long, String, String, String)].collect().sortBy(_._1).toList
    assert(rows == List(
      (1L, "café", "windows-1252", "declared"),
      (2L, "ok", "utf-8", "utf8")))
  }
}
