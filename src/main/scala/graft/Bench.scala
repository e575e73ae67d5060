package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.GraftSpark
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

object Bench {

  /** Per-query task-metric totals: rows read (file scans + cache
    * reads) and shuffle read/write bytes. Wall time alone can't tell
    * a plan regression from machine contention (round-2 lesson: a
    * 3-8x wall-time band with identical plans); rows and shuffle
    * bytes are contention-invariant, so a changed plan (lost
    * pushdown, extra shuffle, broadcast flipped to sort-merge) shows
    * up mechanically. recordsRead is used instead of bytesRead
    * because Spark's vectorized parquet reader on local fs reports
    * only footer-level bytes (measured: a 5-column 600k-row scan and
    * a 1-column scan both report ~17 KB). */
  private final class BytesListener extends SparkListener {
    val rows = new LongAdder; val sRead = new LongAdder; val sWrite = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        rows.add(m.inputMetrics.recordsRead)
        sRead.add(m.shuffleReadMetrics.totalBytesRead)
        sWrite.add(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { rows.reset(); sRead.reset(); sWrite.reset() }
  }

  /** The stdout contract, enforced MECHANICALLY: the harness captures
    * only the last ~2000 chars of stdout (sbt appends ~75 more), so
    * the one JSON line must fit ~1900 or the driver's parse fails
    * (rounds 1-4 shipped "parsed": null exactly this way). The
    * per-query map is included while it fits; past the budget it
    * falls back to stderr and the line keeps the parseable aggregate
    * fields — a driver that can't see per-query times is degraded,
    * one that can't parse AT ALL is blind. Returns (line, Some(map)
    * iff the map overflowed to stderr). */
  val StdoutBudget = 1850

  def stdoutLine(total: String, queriesJson: String, ioTotal: String,
      sfDir: String): (String, Option[String]) = {
    val full =
      s"""{"metric":"steady_total","value":$total,"unit":"sec",""" +
        s""""queries":$queriesJson,"io_total":$ioTotal,"sf":"$sfDir"}"""
    if (full.length <= StdoutBudget) (full, None)
    else (s"""{"metric":"steady_total","value":$total,"unit":"sec",""" +
      s""""queries_in_stderr":true,"io_total":$ioTotal,"sf":"$sfDir"}""",
      Some(queriesJson))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // collect_set/collect_list aggregates (bounded per-group sets:
      // <=25 nation tokens, <=5 event types, fixed-width minhash sigs)
      // otherwise fall back to sort-based aggregation after only 128
      // distinct groups per task -- a full sort of the fact table.
      // 256k in-memory groups x ~100 B of set payload stays well under
      // executor memory at 32 tasks while keeping the agg hash-based.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new BytesListener
    spark.sparkContext.addSparkListener(bytes)
    // Warmup: exercise the parquet-scan → shuffle-agg → noop-sink path
    // once so the first timed query doesn't pay JVM/codegen/reader init.
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // drop caches a previous run pinned (ops own persist() but can't
      // unpersist after returning a lazy frame) so each pass measures
      // the query, not a cache hit, and storage memory doesn't fill
      // with dead entries over 30+ queries
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // fn() runs INSIDE the timing on purpose: for plans with lineage
      // truncation (localCheckpoint forces planning + codegen at
      // construction) the build IS part of the query's cost — q93's
      // build is 10× its execution, and excluding it would be lying.
      // noop sink materializes EVERY output column (count() would let
      // Catalyst prune the aggregates themselves out of the plan).
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    def f(v: Double): String = f"$v%.3f"
    // stdout-map resolution: 10 ms is well inside the ±10% run-to-run
    // noise band; full 3-decimal values stay on stderr per query.
    def f2(v: Double): String = f"$v%.2f"
    // pass 1 = cold (includes per-query codegen); pass 2 = steady state.
    // Cold times + byte metrics go to stderr per query (diagnostics);
    // stdout carries ONE compact JSON line at the end — both prior
    // rounds' full cold+steady maps overflowed the harness's captured
    // tail and broke its JSON parse (BENCH_r01/r02 "parsed": null).
    // dev bisection: SPARK_GRAFT_ONLY=q93_pagerank,q42_... restricts
    // the run (the driver's no-env invocation is unchanged)
    val only: Set[String] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
      // dev: dump the physical plan as seen by THIS harness's session
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
      val cold = once(name, fn)
      GraftSpark.drainListeners(spark.sparkContext)
      bytes.reset() // attribute bytes to the steady pass only
      val steady = once(name, fn)
      GraftSpark.drainListeners(spark.sparkContext)
      val (rows, sr, sw) = (bytes.rows.sum, bytes.sRead.sum, bytes.sWrite.sum)
      System.err.println(
        s"[bench] $name cold=${f(cold)} steady=${f(steady)}" +
          s" input_rows=$rows shuffle_r_b=$sr shuffle_w_b=$sw")
      bytes.reset()
      (name, cold, steady, rows, sr, sw)
    }
    // short query ids stripped to the bare number ("01".."132" —
    // ContractSpec pins uniqueness): the full names cost ~1.3 KB of
    // the tail-capture budget, and at 130+ queries even the "q"
    // prefix (1 B × queries) decides whether the line fits the
    // harness's 2000 B captured tail.
    val qid = (k: String) => k.takeWhile(_ != '_').stripPrefix("q")
    val steady = results.map { case (k, _, w, _, _, _) => s"\"" + qid(k) + "\":" + f2(w) }
      .mkString("{", ",", "}")
    // Budget (measured from BENCH_r04): the harness keeps the LAST
    // 2000 chars of stdout, and sbt appends a ~75-char "[success]"
    // line after ours — so the whole JSON line must fit in ~1900
    // chars or it is front-truncated and the driver's parse fails
    // (rounds 1-4 all shipped "parsed": null this way). The per-query
    // io map (~1.4 KB) is what overflowed it in r04; it moves to
    // stderr in full (rows, shuffle_read, shuffle_write per query,
    // printed above) and the stdout line carries one aggregate pair
    //   io_total = [input_rows/1000, shuffle_write_KB]
    // as the cross-round contention-invariant plan signal.
    // ContractSpec pins the line under the capture budget at
    // worst-case digits.
    val kceil = (v: Long) => (v + 999) / 1000
    val ioTotal = s"[${kceil(results.map(_._4).sum)},${kceil(results.map(_._6).sum)}]"
    val steadyTotal = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    System.err.println(s"[bench] cold_total=${f(coldTotal)} steady_total=${f(steadyTotal)}")
    val (line, overflowMap) =
      Bench.stdoutLine(f(steadyTotal), steady, ioTotal, sfDir)
    overflowMap.foreach(m => System.err.println(s"[bench] queries=$m"))
    // Belt-and-braces artifact: the same JSON (with the FULL query map,
    // never the stderr-overflow variant) lands on disk where a tail
    // capture can't truncate it.
    try {
      val full =
        s"""{"metric":"steady_total","value":${f(steadyTotal)},"unit":"sec",""" +
          s""""queries":$steady,"io_total":$ioTotal,"sf":"$sfDir"}"""
      val p = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, full.getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] bench.json: $e") }
    println(line)
    spark.stop()
  }
}
