package graft.tools
import graft._
/** Dev-loop helper: print the executed plan of named queries at sf0.001. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    for (q <- args) {
      println("======= " + q)
      println(SparkEntry.queries(q)(s, TestSpark.sf0001)
        .queryExecution.executedPlan.toString.take(4000))
    }
  }
}
