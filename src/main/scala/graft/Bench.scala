package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given scale
  * factor and prints one JSON line. Each query is materialized through the
  * noop sink — unlike count(), this computes every output column (count()
  * would let Catalyst prune the projections and under-report the work). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on the smallest SF so per-query timings measure the
    // query, not first-use compilation of the whole SQL stack.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Local-iteration filter: SPARK_GRAFT_ONLY=q28_...,q32_... times just
    // those queries. Unset (the driver's invocation) => full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Bench-only extras (converged PageRank etc.) are reachable ONLY by
    // naming them in SPARK_GRAFT_ONLY — the default full suite stays the
    // oracle board, so round-over-round totals remain comparable.
    val selected = only match {
      case Some(names) =>
        (SparkEntry.queries ++ SparkEntry.benchExtras).filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }

    // Box-calibration probe (round-10 ask #1): two FIXED synthetic
    // microbenchmarks, identical on every box and every scale factor, so
    // cross-round absolute walls can be normalized by measured box speed
    // instead of settled by ad-hoc same-box A/Bs (the round-10 q149 sf10
    // 2x2). `shuffle_sec` exercises the CPU+shuffle path (seeded hash →
    // 1M-key groupBy+agg → sort); `io_sec` the storage stack (write a
    // ~256 MB parquet, read it fully back — page cache included, which is
    // the stack the bench queries themselves see). Best-of-2 each, run
    // BEFORE pass 1 on the already-warmed JVM; recorded in every sidecar
    // as `box_calibration` and surfaced by tools/scaling_report.py.
    def calibrate(): (Double, Double) = {
      import org.apache.spark.sql.functions._
      def timeIt(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def shuffleOnce(): Double = timeIt {
        // xxhash64, not an LCG multiply: Spark 4 runs ANSI mode, where a
        // seeded-multiply hash overflows long and THROWS. The hash is the
        // same fixed work on every box, which is all the probe needs.
        spark.range(0L, 32L * 1000 * 1000, 1L, 32)
          .select(xxhash64(col("id")).as("h"))
          .groupBy(pmod(col("h"), lit(1000000L)).as("k"))
          // sum over a BOUNDED value: ANSI sum(long) over 32M raw hashes
          // would itself overflow and throw.
          .agg(sum(pmod(col("h"), lit(1000L))).as("s"), count(lit(1)).as("c"))
          .orderBy(col("k"))
          .write.format("noop").mode("overwrite").save()
      }
      def ioOnce(): Double = {
        val dir = WorkDirs.fresh("box_probe")
        val dt = timeIt {
          spark.range(0L, 16L * 1000 * 1000, 1L, 32)
            .select(col("id"), (col("id") * lit(0.5)).as("d"),
              concat(lit("payload_"), col("id").cast("string")).as("s"))
            .write.mode("overwrite").parquet(dir)
          spark.read.parquet(dir)
            .write.format("noop").mode("overwrite").save()
        }
        WorkDirs.drop(dir)
        dt
      }
      val sh = math.min(shuffleOnce(), shuffleOnce())
      val io = math.min(ioOnce(), ioOnce())
      System.err.println(f"[bench] box calibration: shuffle $sh%.2f s, io $io%.2f s")
      (sh, io)
    }
    // A probe failure must NEVER kill the bench run (the round-11 first
    // campaign died here on an ANSI overflow before timing a single
    // query): degrade to the -1.0 sentinel and keep benching.
    val (calShuffle, calIo) =
      try calibrate()
      catch { case e: Throwable =>
        System.err.println(s"[bench] box calibration FAILED: ${e.getMessage}")
        (-1.0, -1.0)
      }

    // Hypervisor steal time (jiffies, USER_HZ=100): the direct evidence of
    // co-tenant contention. Sampled around every timed run — wall time
    // stretched by stolen CPU is a property of the machine, not the plan.
    def stealJiffies(): Long =
      try {
        val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).getOrElse("")
        val f = cpu.trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } catch { case _: Throwable => 0L }

    final case class Sample(dt: Double, tainted: Boolean)
    val failedSet = scala.collection.mutable.Set.empty[String]
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Sample = {
      // Off-the-clock memo restore: the post-run sweep below evicts the
      // session-lifetime IVF/PQ indexes along with everything else, so
      // index-probe queries would otherwise pay a full index rebuild in
      // EVERY best-of-N sample (round-7 ADVICE). Rebuilding here keeps
      // the sweep simple (no selective-unpersist bookkeeping) while the
      // timed section measures the probe, as the index contract intends.
      // A FAILED warm-up means the timed sample silently pays the rebuild —
      // exactly the probe-vs-rebuild incomparability this hook removes — so
      // it must be loud: logged AND the sample marked tainted, which routes
      // it through the same suspect/retry machinery as a steal storm.
      var warmFailed = false
      if (SparkEntry.IndexBackedQueries(name))
        try SparkEntry.warmIndexes(spark, sfDir)
        catch { case e: Throwable =>
          warmFailed = true
          System.err.println(s"[bench] $name: warmIndexes FAILED (sample will " +
            s"pay the index rebuild): ${e.getMessage}")
        }
      val s0 = stealJiffies()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failedSet += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Defensive isolation: no run inherits another's cached blocks
      // (iterative ops cache intermediates; stale blocks skew timings) —
      // including persisted RDDs, which localCheckpoint pins OUTSIDE the
      // catalog cache (the storage leak that OOM'd a 145-query dump JVM).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val stolen = (stealJiffies() - s0) / 100.0 // CPU-seconds stolen, all cores
      // Tainted when the hypervisor stole a meaningful FRACTION OF MACHINE
      // CAPACITY during the run (steal is cross-core CPU time: on a 32-core
      // box, capacity over dt wall-seconds is 32*dt CPU-seconds — an
      // ambient trickle is harmless, a storm is not). This catches what
      // best-of-N cannot: a contention storm outlasting all consecutive
      // samples makes them AGREE with each other while being uniformly
      // wrong.
      val capacity = Runtime.getRuntime.availableProcessors() * dt
      Sample(dt, warmFailed || (stolen > 1.0 && stolen > 0.10 * capacity))
    }

    // Pass 1: best-of-2 per query (min of independent runs defeats brief
    // spikes), plus a third sample when the two disagree >2x, plus a
    // MANDATORY third sample for sub-5 s queries — on those, scheduler
    // jitter is the same order as the measurement, and two agreeing-but-
    // wrong samples caused round 5's phantom q60 "regression" (3.83 s on
    // unchanged code). Three samples put a visible variance bound in the
    // sidecar (`runs` below) so a swing can be read against its spread.
    val firstPass = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val base = Seq(once(name, fn), once(name, fn))
      val samples =
        if (failedSet(name)) base
        else if (base.map(_.dt).max > 2 * base.map(_.dt).min + 0.5) base :+ once(name, fn)
        else if (base.map(_.dt).min < 5.0) base :+ once(name, fn)
        else base
      name -> samples
    }
    // Pass 2 (bounded): suspect queries are re-timed after the rest of the
    // suite ran — minutes of temporal distance, which is what a storm that
    // spans consecutive samples needs. Suspect = every sample steal-tainted
    // (CPU stolen by a co-tenant), OR the best time is implausibly slow for
    // this suite (>12 s — catches IO/memory-side contention that steals no
    // CPU but still agreed across consecutive samples). A retry that fails
    // to beat the previous best by >30% CONFIRMS the cost is real and stops
    // the retries, so a genuinely heavy query pays at most one extra run.
    val suspectSecs = 12.0
    val results = firstPass.map { case (name, samples) =>
      val fn = selected(name)
      var all = samples
      var retries = 0
      var confirmed = false
      def suspect = all.forall(_.tainted) || all.map(_.dt).min > suspectSecs
      while (!failedSet(name) && retries < 2 && !confirmed && suspect) {
        System.err.println(s"[bench] $name: suspect timing (${
          all.map(s => f"${s.dt}%.2f").mkString(", ")}); re-timing after the suite")
        val prevMin = all.map(_.dt).min
        val s = once(name, fn)
        all = all :+ s
        retries += 1
        if (!s.tainted && s.dt > 0.7 * prevMin) confirmed = true
      }
      val clean = all.filterNot(_.tainted)
      val pool = if (clean.nonEmpty) clean else all
      val dt = pool.map(_.dt).min
      val flag =
        if (failedSet(name)) "  FAILED"
        else if (clean.isEmpty) "  (still tainted)"
        else ""
      System.err.println(
        f"[bench] $name%-28s $dt%8.2f s  (runs: ${
          all.map(s => f"${s.dt}%.2f" + (if (s.tainted) "*" else "")).mkString(", ")})$flag")
      (name, dt, failedSet(name), all)
    }
    // A failed query's time-to-exception is NOT a measurement — reporting it
    // would let a fast failure masquerade as a fast query. Failures are
    // excluded from `queries`/total and listed explicitly.
    val ok = results.collect { case (k, v, false, _) => k -> v }
    val failedNames = results.collect { case (k, _, true, _) => k }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    // Engine vs ML split: the ML entries deliberately measure model-fit
    // walls (q109 is ~11% of the round-5 total on its own), which would
    // otherwise dominate round-over-round ENGINE comparisons. Both groups
    // stay in `queries`/`value` (the driver's headline is unchanged); the
    // split totals let a reader compare engines across rounds cleanly.
    val mlQueries = Set("q109_gbt_train_score")
    val mlTotal = ok.collect { case (k, v) if mlQueries(k) => v }.sum
    val engineTotal = total - mlTotal
    // Per-query sample lists — the variance bound. `queries` carries the
    // min; `runs` carries every sample so a swing on unchanged code can be
    // judged against its own spread instead of a single point.
    val runsJson = results.collect { case (k, _, false, ss) =>
      "\"" + k + "\":" + ss.map(s => f"${s.dt}%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // Steal-taint summary as DATA, not a log line: per-query count of
    // tainted samples (nonzero entries only), so a reader of the artifact
    // can see which timings fought co-tenant contention without digging
    // through stderr. A query whose EVERY sample was tainted reports its
    // min anyway (flagged "(still tainted)" in the log) — this field is
    // how that shows up in the JSON.
    val taintedJson = results.collect {
      case (k, _, false, ss) if ss.exists(_.tainted) =>
        "\"" + k + "\":" + ss.count(_.tainted)
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","engine_total":$engineTotal,"ml_total":$mlTotal,"box_calibration":{"shuffle_sec":$calShuffle,"io_sec":$calIo},"queries":$qs,"runs":$runsJson,"tainted":$taintedJson,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // Sidecar copy: the driver's round artifact stores a bounded log tail,
    // and with 100 queries the single JSON line can outgrow it (BENCH_r03
    // lost its head, leaving parsed=null). A file survives any tail length.
    // Default name carries the scale factor so back-to-back runs at
    // different SFs (sf0.01 local iteration, sf0.1 driver round) don't
    // clobber each other; SPARK_GRAFT_BENCH_OUT stays the override.
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_|_$", "")
    // The un-tagged legacy path keeps working for any reader that expects
    // it (last-run-wins there is acceptable; the tagged file is the one
    // concurrent runs can't clobber).
    val sidecars = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .map(Seq(_))
      .getOrElse(Seq(s"/tmp/bench_last_$sfTag.json", "/tmp/bench_last.json"))
    sidecars.foreach { sidecar =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(sidecar),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: java.io.IOException =>
        System.err.println(s"[bench] sidecar write failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
