package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object UrlProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val q = SparkEntry.queries("q_domain_links")(spark, dir)
    val plan = q.queryExecution.optimizedPlan
    def treeSize(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Int =
      1 + p.children.map(c => treeSize(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]])).sum
    println("optimized plan nodes: " + treeSize(plan))
    // expression node counts per plan operator
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    def exprNodes(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      1 + e.children.map(exprNodes).sum
    plan.foreach { op =>
      val n = op.expressions.map(exprNodes).sum
      if (n > 500) println(f"$n%8d expr nodes in ${op.getClass.getSimpleName} ")
    }
    q.count()
    spark.stop()
  }
}
