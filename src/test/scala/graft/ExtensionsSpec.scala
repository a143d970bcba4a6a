package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The SparkSessionExtensions entry point injects without error and its
  * builders construct working expressions (exercised through SQL via the
  * same builder list in DuckAliases). */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects all engine functions") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
    assert(GraftExtensions.functions.map(_._1).toSet == Set(
      "cosine_similarity", "shingle_array", "shingle_hash_array",
      "rolling_fingerprint", "word_chunks", "term_counts",
      "len", "unnest", "list_contains", "list_extract"))
  }

  test("word_chunks + term_counts callable from SQL") {
    val r = spark.sql(
      """SELECT word_chunks('a b c d e', 2) AS wc,
        |term_counts('x y x') AS tc""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b", "c d", "e"))
    val tc = r.getSeq[org.apache.spark.sql.Row](1)
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(tc == Map("x" -> 2L, "y" -> 1L))
  }

  test("shingle_array + rolling_fingerprint callable from SQL") {
    val r = spark.sql(
      """SELECT shingle_array('a b c d', 3) AS sh,
        |rolling_fingerprint('hello world rolling hash', 8) AS fp""".stripMargin)
      .head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getLong(1) != 0L)
  }
}
