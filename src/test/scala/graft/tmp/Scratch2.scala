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
    val df = gs.sql(
      """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS s,
        |       round(absolute_error(s), 6) AS abs_err
        |FROM li WHERE l_quantity > 25
        |GROUP BY l_returnflag ORDER BY l_returnflag
        |WITH ERROR 0.9""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    println("=== PUSHDOWN CHECK (q23 shape) ===")
    println("PushedFilters lines:")
    plan.split("\n").filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
      .foreach(l => println(l.trim.take(200)))
    // text stats: column pruning
    spark.read.parquet(dir + "/documents.parquet").createOrReplaceTempView("docs")
    val q9 = graft.SparkEntry.queries("q09_text_stats")(spark, dir)
    println("=== q09 ReadSchema ===")
    q9.queryExecution.executedPlan.toString.split("\n")
      .filter(_.contains("ReadSchema")).foreach(l => println(l.trim.take(200)))
    spark.stop()
  }
}
