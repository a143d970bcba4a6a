package graft.tools

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Round-12 whole-inventory timed sweep (VERDICT r11 item 7): run EVERY
  * `SparkEntry.queries` key — not just the 33-row bench basket — at one
  * tier (default sf1), two timed runs each after a warm pass, and write
  * one JSON line per query to `SWEEP.json`. Catches regressions in the
  * ~140 keys the per-round bench never times.
  *
  * Each query runs inside its own job group with a watchdog: a key that
  * exceeds the per-query budget (default 300 s — the exactness
  * baselines like q44 are quadratic by design) is cancelled via
  * `cancelJobGroup` and recorded as `"status":"timeout"` rather than
  * stalling the sweep. Errors record the exception class; the sweep
  * always completes and always writes the artifact. */
object InventorySweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf1")
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_SWEEP_BUDGET", "300").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_SWEEP_OUT", "SWEEP.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(spark)

    val pool = Executors.newSingleThreadExecutor()
    def runOne(name: String, dir: String): Either[String, Double] = {
      val fut = pool.submit(new java.util.concurrent.Callable[Double] {
        def call(): Double = {
          spark.sparkContext.setJobGroup(s"sweep-$name", name,
            interruptOnCancel = true)
          val t0 = System.nanoTime()
          try graft.operators.NamedQuery.withConf(spark,
            SparkEntry.queryConf.getOrElse(name, Map.empty)) {
            SparkEntry.benchOverrides.getOrElse(name, SparkEntry.queries(name))
              .apply(spark, dir)
              .write.mode("overwrite").format("noop").save()
          } finally spark.sparkContext.clearJobGroup()
          (System.nanoTime() - t0) / 1e9
        }
      })
      try Right(fut.get(budgetS.toLong, TimeUnit.SECONDS))
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(s"sweep-$name")
          fut.cancel(true)
          // let the cancelled job unwind before the next query starts
          try fut.get(30, TimeUnit.SECONDS) catch { case _: Throwable => () }
          Left("timeout")
        case e: java.util.concurrent.ExecutionException =>
          val c = Option(e.getCause).getOrElse(e)
          Left(s"error:${c.getClass.getSimpleName}")
      } finally spark.catalog.clearCache()
    }

    // load sentinel bracketing, same contract as Bench
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 22).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    val keys = SparkEntry.queries.keys.toSeq.sorted
    println(s"[sweep] ${keys.size} keys, sf=$sfDir, budget=${budgetS}s")
    val sb = new StringBuilder
    var totalOk = 0.0
    val senStart = sentinel()
    keys.zipWithIndex.foreach { case (name, i) =>
      // warm pass at the smallest sf (codegen + plan caches), untimed
      runOne(name, "/root/testdata/sf0.001")
      val runs = Seq(runOne(name, sfDir), runOne(name, sfDir))
      val sen = sentinel()
      val row = runs.collect { case Right(v) => v } match {
        case ok if ok.nonEmpty =>
          val best = ok.min
          totalOk += best
          f"""{"query":"$name","status":"ok","runs":[${
            ok.map(v => f"$v%.3f").mkString(",")}],"best":$best%.3f,"sen":$sen%.3f}"""
        case _ =>
          val why = runs.collectFirst { case Left(w) => w }.getOrElse("?")
          s"""{"query":"$name","status":"$why","sen":$sen}"""
      }
      println(s"[sweep] ${i + 1}/${keys.size} $row")
      sb.append(row).append('\n')
      System.gc()
    }
    val senEnd = sentinel()
    sb.append(s"""{"query":"_total","status":"ok","best":$totalOk,""" +
      s""""sen_start":$senStart,"sen_end":$senEnd,"sf":"$sfDir"}""" + "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    pool.shutdownNow()
    spark.stop()
    println(s"[sweep] wrote $out")
  }
}
