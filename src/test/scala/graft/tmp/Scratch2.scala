package graft.tmp
import org.apache.spark.sql.SparkSession
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val gs = graft.GraftSession(spark)
    spark.read.parquet(dir + "/lineitem.parquet").createOrReplaceTempView("li")
    gs.sql("CREATE SAMPLE TABLE li_s ON li OPTIONS(qcs 'l_returnflag', fraction '1.0')")

    println("=== HAVING with relative_error ===")
    try gs.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS s,
        |       round(absolute_error(s), 6) AS abs_err
        |FROM li GROUP BY l_returnflag
        |HAVING relative_error(s) < 0.5 AND sum(l_quantity) > 0
        |ORDER BY l_returnflag
        |WITH ERROR 0.9""".stripMargin).show()
    catch { case e: Throwable => println("FAIL: " + e.getMessage.take(400)) }

    println("=== ORDER BY error fn ===")
    try gs.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS s
        |FROM li GROUP BY l_returnflag
        |ORDER BY absolute_error(s), l_returnflag
        |WITH ERROR 0.9""".stripMargin).show()
    catch { case e: Throwable => println("FAIL: " + e.getMessage.take(400)) }

    println("=== bootstrap estimator SQL ===")
    try {
      spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
      val df = gs.sql(
        """SELECT l_returnflag, round(sum(l_quantity), 4) AS s,
          |       round(avg(l_extendedprice), 6) AS a,
          |       lower_bound(s) AS lb, upper_bound(s) AS ub,
          |       (lower_bound(s) <= s AND s <= upper_bound(s)) AS ci_ok
          |FROM li GROUP BY l_returnflag ORDER BY l_returnflag
          |WITH ERROR 0.9""".stripMargin)
      df.show()
      spark.conf.set("spark.sql.aqp.estimator", "closedform")
    } catch { case e: Throwable =>
      println("FAIL: " + e.getMessage.take(400))
      spark.conf.set("spark.sql.aqp.estimator", "closedform") }

    println("=== bootstrap 5pct sample CI sanity ===")
    try {
      gs.sql("CREATE SAMPLE TABLE li_s5 ON li OPTIONS(qcs 'l_linestatus', fraction '0.05')")
      spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
      gs.sql(
        """SELECT l_linestatus, round(sum(l_quantity), 4) AS s,
          |       round(relative_error(s), 6) AS rel,
          |       (lower_bound(s) <= s AND s <= upper_bound(s)) AS ci_ok
          |FROM li GROUP BY l_linestatus ORDER BY l_linestatus
          |WITH ERROR 0.9""".stripMargin).show()
      spark.conf.set("spark.sql.aqp.estimator", "closedform")
    } catch { case e: Throwable =>
      println("FAIL: " + e.getMessage.take(400))
      spark.conf.set("spark.sql.aqp.estimator", "closedform") }
    spark.stop()
  }
}
