package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CloneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pv = PanelView.of(spark, "/root/testdata/sf0.1")
    pv.count() // warm
    def t[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $n%-26s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    (1 to 3).foreach { i =>
      t(s"direct count $i")(pv.count())
      val scoped = t(s"clone $i")(
        org.apache.spark.sql.graftbridge.SessionScope.cloned(spark))
      scoped.conf.set("spark.sql.adaptive.enabled", "false")
      val rb = t(s"rebind $i")(
        org.apache.spark.sql.graftbridge.SessionScope.rebind(pv, scoped))
      t(s"rebound count $i")(rb.count())
      t(s"rebound count again $i")(rb.count())
    }
    spark.stop()
  }
}
