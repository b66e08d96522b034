package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSessionExtensions}

class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after extension registration") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftSqlBridge.registerFunctions(ext, spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head.getDouble(0)
    assert(r === 32.0)
    // type check surfaces as an analysis error, not a runtime crash
    val err = intercept[Exception] {
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<double>"))
  }
}
