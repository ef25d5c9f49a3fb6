package tmpdbg
import org.apache.spark.sql.SparkSession
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    val r = graft.crawl.Crawl.run(spark, graft.crawl.Crawl.Config(scale = 200, limitPerSite = 50))
    r.lineage.orderBy("wave", "partition_id").show(40, false)
    spark.stop()
  }
}
