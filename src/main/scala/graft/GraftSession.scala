package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** Opinionated session factory: the configuration this engine is designed
  * against (AQE on, shuffle parallelism = cores not 200, UTC session
  * timezone for oracle parity, custom SQL functions injected). On a real
  * cluster, pass the master/cores of the deployment; everything else
  * carries over unchanged.
  */
object GraftSession {
  /** Parses a value that must hold a positive Int, with a curated error
    * for EVERY bad input — including values past Int.MaxValue, which a
    * regex-then-toInt check lets through to a raw NumberFormatException.
    * Package-private so the validation itself is spec-testable without
    * mutating the process environment.
    */
  private[graft] def parsePositiveInt(name: String, v: String): Int = {
    require(v.matches("[0-9]{1,18}") && {
      val n = v.toLong; n > 0 && n <= Int.MaxValue
    }, s"$name must be a positive integer <= ${Int.MaxValue}, got: '$v'")
    v.toInt
  }

  private def envPositiveInt(name: String): Option[Int] =
    sys.env.get(name).map(parsePositiveInt(name, _))

  /** Validated SPARK_GRAFT_SHUFFLE_PARTITIONS, for callers whose shuffle
    * sizing should be operator-overridable (bench/scaling entry points).
    */
  def envShufflePartitions: Option[Int] =
    envPositiveInt("SPARK_GRAFT_SHUFFLE_PARTITIONS")

  def create(
      appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None,
      uiEnabled: Boolean = false): SparkSession = {
    // SPARK_GRAFT_SHUFFLE_PARTITIONS replaces the CORES-SIZED FALLBACK
    // only — an explicit shufflePartitions parameter always wins, so a
    // caller that deliberately sizes its shuffles (tests pinning plan
    // shape) cannot be silently reconfigured by a stray env var. Shuffle
    // parallelism must track DATA size, not just core count: the sf1
    // scaling audit measured linear-volume posting joins (dedup_winnow:
    // candidate pairs 5.1M → 52.7M, exactly 10.3×) running ~1.8× above
    // linear purely from 32 oversized shuffle partitions spilling; on a
    // 1000-executor cluster this is the spark.sql.shuffle.partitions ≈
    // input-size / 128 MB sizing rule. Data-sizing entry points (Bench,
    // ScaleGen) consult the env var themselves via [[envShufflePartitions]].
    val parts = shufflePartitions
      .orElse(envShufflePartitions)
      .getOrElse(math.max(Runtime.getRuntime.availableProcessors(), 2))
    // AQE coalescing makes shuffle parallelism DATA-adaptive both ways:
    // every shuffle STARTS at initialPartitionNum and AQE coalesces down
    // by observed size, so a fixed cores-sized setting no longer under-
    // partitions a 10x-larger shuffle (the sf1 audit measured sort/join
    // spill pushing linear-volume queries ~1.4-1.8x above linear at 32
    // fixed partitions). On a 1000-executor cluster the same config is
    // the standard recommendation: initialPartitionNum sized for the
    // largest shuffle, advisoryPartitionSizeInBytes doing the sizing.
    val initialParts = envPositiveInt("SPARK_GRAFT_INITIAL_PARTITIONS")
      .getOrElse(parts)
    // Let the planner pick SHUFFLED HASH JOIN when its size conditions are
    // met instead of always preferring sort-merge (guide §3.1/§9): the
    // build side must fit numPartitions × autoBroadcastJoinThreshold and
    // be ≥3× smaller than the probe side, so the OOM guardrails stay, and
    // AQE re-plans from observed sizes. Measured on the declared bench
    // (sf0.1, 22-query subset): 78.6 → 69.5 s raw — the sort on both
    // sides of every mid-size equi-join was pure overhead. At cluster
    // scale the same preference is the standard recommendation; sort-merge
    // still wins automatically wherever the size conditions fail.
    // SPARK_GRAFT_PREFER_SMJ=1 restores the default for A/B comparison.
    val preferSmj = sys.env.get("SPARK_GRAFT_PREFER_SMJ").contains("1")
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", preferSmj.toString)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialParts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as LongType nanos
      // (see Tables.events). Set once here — not inside query builders.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", uiEnabled.toString)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate may have returned a pre-existing session, in which case
    // withExtensions was never consulted — register on the live session so
    // the SQL-function contract holds either way.
    plans.GraftFunctions.register(s)
    s
  }
}
