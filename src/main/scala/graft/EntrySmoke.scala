package graft
import org.apache.spark.sql.SparkSession

/** Temporary probe: simulate the driver's entry smoke (fresh session WITHOUT
  * our special confs, then SparkEntry.entry rows>0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_SMOKE rows=$n schema=${df.schema.simpleString}")
    df.show(5, false)
    spark.stop()
  }
}
