package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents

/** Single-variable CC scratch microbench (round-7 ROADMAP #1/#2 enabler).
  *
  * The 32M trace (`tools/r7_32m_dftrace.log`) showed CC owning the
  * pipeline's peak in-flight scratch (46.6 GB crest) — but inside a full
  * pipeline run the CC window can never be measured in isolation, so
  * engine-level CC changes (one-pair-per-check, retire-inside-star-pair)
  * lack single-variable attribution. This tool isolates it: a
  * deterministic chain-graph edge set (the exact shape V4 bucket chaining
  * emits — G spanning chains of length S−1, worst case for star-step
  * depth), `components()` with the production retire hook, and a 2 s
  * scratch-disk sampler. Two runs on two engine revisions give the CC
  * delta and nothing else.
  *
  * Usage: runMain graft.tools.CcScratchBench <nodes> <chainLen> <cpus>
  *   e.g.   runMain graft.tools.CcScratchBench 8000000 64 32
  * Prints one JSON line:
  *   {"metric":"cc_scratch","nodes":…,"edges":…,"chain_len":…,"cpus":…,
  *    "components":…,"sec":…,"baseline_gb":…,"peak_inflight_gb":…}
  */
object CcScratchBench {

  def main(args: Array[String]): Unit = {
    val nodes = if (args.length > 0) args(0).toLong else 2000000L
    val chainLen = if (args.length > 1) args(1).toInt else 64
    val cpus = if (args.length > 2) args(2).toInt else 32
    require(chainLen >= 2, "chainLen must be >= 2")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cc-scratch")
      // mirror the ScalingBench production confs so the measured window
      // matches what the pipeline's CC phase sees (incl. the round-7
      // lean-heap storageFraction)
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.memory.storageFraction", "0.2")
      // NOT the pipeline's 2min: this tool retires explicitly after every
      // star pair, so the periodic driver GC adds nothing — and it is
      // actively dangerous here. Both 64M-node attempts on 2min died at
      // exactly the 120 s mark: the JVM may collect a local's object after
      // its LAST USE even mid-method, so once `edges` is passed to
      // components() its checkpoint RDD is only weakly reachable, and a
      // forced driver GC lets ContextCleaner delete rdd blocks that the
      // in-flight lazily-checkpointed first CC iteration still reads
      // ("/tmp/blockmgr-…/rdd_3_… No such file or directory"). The
      // pipeline is immune (its caches live in Result and are unpersisted
      // explicitly); a microbench is exactly where the sharp edge shows.
      .config("spark.cleaner.periodicGC.interval", "1h")
      // this tool measures the DISTRIBUTED star loop's scratch: pin the
      // round-8 driver union-find fast path off so small invocations still
      // measure the loop they claim to
      .config("spark.graft.cc.driverUnionFindMaxEdges", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // scratch sampler: bytes used on the filesystem backing Spark's
    // ACTUAL scratch location — resolved from spark.local.dir /
    // SPARK_LOCAL_DIRS, falling back to java.io.tmpdir (ADVICE r7: the
    // round-7 version always sampled java.io.tmpdir, which silently
    // measures the wrong volume when the local dirs point elsewhere).
    // The sampled path is reported in the JSON so a reader can tell.
    val scratchPath = spark.conf.getOption("spark.local.dir")
      .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
      .map(_.split(",").head.trim)
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val store = Files.getFileStore(Paths.get(scratchPath))
    def usedBytes(): Long = store.getTotalSpace - store.getUsableSpace
    val baseline = usedBytes()
    val peak = new AtomicLong(baseline)
    val sampler = new Thread(() => {
      while (!Thread.currentThread().isInterrupted) {
        peak.updateAndGet(math.max(_, usedBytes()))
        try Thread.sleep(2000) catch { case _: InterruptedException => return }
      }
    }, "cc-scratch-sampler")
    sampler.setDaemon(true)

    // G chains of chainLen nodes: edge (i, i+1) unless i closes a chain.
    // localCheckpoint'ed so the retire hook's safety contract holds (the
    // input must be checkpoint- or keep-set-backed).
    val edges = spark.range(0, nodes, 1, cpus * 8)
      .where(pmod(col("id"), lit(chainLen)) =!= (chainLen - 1))
      .select(col("id").as("a"), (col("id") + 1).as("b"))
      .localCheckpoint()
    val eCount = edges.count()

    val keep = org.apache.spark.graft.ShuffleRetirement.liveIds(spark.sparkContext)
    val retire = () => {
      org.apache.spark.graft.ShuffleRetirement
        .retireAllExcept(spark.sparkContext, keep); ()
    }

    sampler.start()
    val t0 = System.nanoTime()
    val comps = ConnectedComponents.components(spark, edges, retire = retire)
    val nComps = comps.select(countDistinct(col("cluster_id"))).head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    sampler.interrupt()

    // post-run use of `edges` (unpersist) doubles as a strong reference
    // that keeps its checkpoint RDD reachable for the whole CC run — see
    // the periodicGC comment above
    graft.util.Checkpoints.unpersistCheckpoint(edges)

    val expected = (nodes + chainLen - 1) / chainLen
    require(nComps == expected,
      s"CC returned $nComps components, expected $expected — measurement invalid")
    println(f"""{"metric":"cc_scratch","nodes":$nodes,"edges":$eCount,"chain_len":$chainLen,"cpus":$cpus,"components":$nComps,"sec":$sec%.2f,"baseline_gb":${baseline / 1e9}%.2f,"peak_inflight_gb":${(peak.get() - baseline) / 1e9}%.2f,"sampled_path":"$scratchPath"}""")
    spark.stop()
  }
}
