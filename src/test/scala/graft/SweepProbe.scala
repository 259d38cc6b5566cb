package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Per-query echo variant of [[PlanSweepSpec]] for large scale fixtures:
  * the spec runs all 248 constructions inside one anonymous test, so
  * when a construction-time driver job dies at scale (e.g. the r14
  * 1000x sweep's maxResultSize abort) the log does not say WHICH query
  * was being built. This main prints the query name BEFORE constructing
  * it and the plan verdict + wall time after, so a scale-killer in
  * query construction is attributable from the log alone.
  *
  *   sbt 'Test/runMain graft.SweepProbe /tmp/sf1000x'
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = ProfileHarness.session()
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        println(s"PROBE begin $name")
        val t0 = System.nanoTime()
        try {
          val p = fn(spark, dir).queryExecution.sparkPlan
          val carts = p.collect { case c: CartesianProductExec => c }
          val badWin = p.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => "Window"
            case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
              "WindowGroupLimit"
          }
          val verdict =
            if (carts.nonEmpty) { bad += 1; "CARTESIAN" }
            else if (badWin.nonEmpty) { bad += 1; s"UNPARTITIONED ${badWin.mkString(",")}" }
            else "ok"
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"PROBE end   $name%-28s $verdict ($dt%.1f s)")
        } catch {
          case e: Throwable =>
            bad += 1
            val dt = (System.nanoTime() - t0) / 1e9
            println(f"PROBE FAIL  $name%-28s ($dt%.1f s): ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    println(s"PROBE done, offenders=$bad")
    spark.stop()
  }
}
