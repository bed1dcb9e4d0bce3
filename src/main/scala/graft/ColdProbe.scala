package graft
import org.apache.spark.sql.SparkSession

// temporary cold-path phase profiler — deleted before commit
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[cold] $n%-18s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warmup
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_orderkey").count().count()
    (1 to 2).foreach { rep =>
      val pp = t(s"preprocess#$rep")(graft.did.Preprocess.run(
        PanelView.of(spark, dir), PanelView.config))
      val fitNoB = t(s"fit(no bstrap)#$rep")(graft.did.AttGt.fit(pp))
      fitNoB.unpersist()
      val fit = t(s"fit(bstrap)#$rep")(graft.did.AttGt.fit(pp, bstrap = true))
      t(s"resultDF#$rep")(fit.resultDF.count())
      fit.unpersist(); pp.unpersist()
    }
    spark.stop()
  }
}
