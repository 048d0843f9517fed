package graft

/** Throwaway plan probe (dev aid, not a spec). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    args.foreach { q =>
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      println(s"===== $q =====")
      println(p.toString)
    }
    spark.stop()
  }
}
