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
    println("=== compound: sum(expr), ratio of aggregates, error fns ===")
    try gs.sql(
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       round(absolute_error(revenue), 6) AS abs_err,
        |       round(sum(l_quantity) / count(*), 6) AS qty_per_item,
        |       round(avg(l_quantity + l_tax), 6) AS avg_qt
        |FROM li GROUP BY l_returnflag ORDER BY l_returnflag
        |WITH ERROR 0.9""".stripMargin).show()
    catch { case e: Throwable => println("FAIL: " + e.getMessage.take(500)) }
    spark.stop()
  }
}
