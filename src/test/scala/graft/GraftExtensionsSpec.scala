package graft

import org.scalatest.funsuite.AnyFunSuite

/** The injected SQL functions must be callable from SQL text. Uses the
  * shared session via registerAll (extension-builder application needs a
  * fresh session, which would tear down the shared SparkContext). */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rolling_hash and json_duplicate_keys are SQL-callable") {
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
                rolling_hash('abc', 31, 1000000007) AS rh2,
                json_duplicate_keys('{"a":1,"a":2,"b":3}') AS dups,
                json_duplicate_keys('not json') AS bad""").head()
    val expected = ((97L * 31 + 98) * 31 + 99) % 1000000007L // "abc" bytes
    assert(row.getLong(0) == expected)
    assert(row.getLong(1) == expected)
    assert(row.getSeq[String](2) == Seq("a"))
    assert(row.getSeq[String](3) == Seq("__PARSE_ERROR__"))
  }

  test("mixed-width integer literals resolve; bad arity reports usage") {
    GraftExtensions.registerAll(spark)
    // 31 parses as INT, 3000000007 as BIGINT — both must be accepted
    val r = spark.sql("SELECT rolling_hash('abc', 31, 3000000007) AS rh").head()
    assert(r.getLong(0) == ((97L * 31 + 98) * 31 + 99) % 3000000007L)
    val e = intercept[Exception](spark.sql("SELECT json_duplicate_keys('a','b')").head())
    assert(e.getMessage.contains("takes 1 argument"))
    // out-of-int-range BIGINT literal must error, not truncate to a
    // nonsense width (4294967296.toInt == 0 → all-zero z-order keys)
    val e2 = intercept[Exception](
      spark.sql("SELECT z_order(1, 2, 4294967296)").head())
    assert(e2.getMessage.contains("bit width"))
  }

  test("min_k_longs is SQL-callable as a grouped aggregate") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    (1L to 10L).map(i => (i % 2, 11L - i)).toDF("g", "v")
      .createOrReplaceTempView("mkl_in")
    val got = spark.sql(
      "SELECT g, min_k_longs(v, 3) AS mk FROM mkl_in GROUP BY g ORDER BY g")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(got == Seq((0L, Seq(1L, 3L, 5L)), (1L, Seq(2L, 4L, 6L))))
  }
}
