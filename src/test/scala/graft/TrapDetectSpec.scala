package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TrapDetect

/** First-failing trap-rule semantics pinned for the `crawl_traps`
  * oracle. */
class TrapDetectSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def reason(path: String, query: String): String = {
    import spark.implicits._
    TrapDetect.withTrapReason(
        Seq((path, query)).toDF("path", "query"), "path", "query")
      .select("trap_reason").as[String].collect().head
  }

  test("each rule fires on its shape") {
    assert(reason("/a/b/a/c/a", "x=1") == "repeat_segment")
    assert(reason("/1/2/3/4/5/6/7/8/9/10/11/12/13", "") == "depth")
    assert(reason("/p", "a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9") ==
      "query_blowup")
    assert(reason("/p",
      "sid=0123456789abcdef0123456789abcdef&x=2") == "session_id")
    assert(reason("/archive/1901/01/", "") == "calendar")
    assert(reason("/a/b/c", "x=1&y=2") == "ok")
  }

  test("first-failing precedence: repeat beats depth beats session") {
    assert(reason("/a/a/a/4/5/6/7/8/9/10/11/12/13",
      "sid=0123456789abcdef0123456789abcdef") == "repeat_segment")
    assert(reason("/1/2/3/4/5/6/7/8/9/10/11/12/13",
      "sid=0123456789abcdef0123456789abcdef") == "depth")
  }

  test("boundaries hold: exactly 12 segments, 8 params, in-range year") {
    assert(reason("/1/2/3/4/5/6/7/8/9/10/11/12",
      "a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8") == "ok")
    assert(reason("/archive/1995/", "") == "ok")
    assert(reason("/archive/2030/", "") == "ok")
    assert(reason("/archive/2031/", "") == "calendar")
  }

  test("two repeats are fine, three trap; hex shorter than 32 passes") {
    assert(reason("/a/b/a", "") == "ok")
    assert(reason("/p", "sid=0123456789abcdef") == "ok")
  }
}
