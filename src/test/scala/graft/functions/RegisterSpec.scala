package graft.functions

import graft.SparkSpec

class RegisterSpec extends SparkSpec {
  import spark.implicits._

  test("custom functions are callable from SQL after registration") {
    Register.registerAll(spark)
    Seq(("hello world", 2.0, 10.0)).toDF("s", "v", "w").createOrReplaceTempView("reg_t")
    val row = spark.sql("""
      SELECT rolling_hash(s) AS h, graft_slugify(s) AS slug,
             graft_weighted_avg_cents(v, w) AS wavg
      FROM reg_t GROUP BY s""").head()
    val expected = "hello world".getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    assert(row.getLong(0) === expected)
    assert(row.getString(1) === "hello-world")
    assert(row.getDouble(2) === 2.0)
  }
}
