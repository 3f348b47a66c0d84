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
  def create(
      appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None,
      uiEnabled: Boolean = false): SparkSession = {
    // SPARK_GRAFT_SHUFFLE_PARTITIONS overrides the cores-sized default:
    // shuffle parallelism must track DATA size, not just core count. The
    // sf1 scaling audit measured the cost of ignoring this — linear-volume
    // posting joins (dedup_winnow: candidate pairs 5.1M → 52.7M, exactly
    // 10.3×) ran ~1.8× above linear purely from 32 oversized shuffle
    // partitions spilling; on a 1000-executor cluster this is the
    // spark.sql.shuffle.partitions ≈ input-size / 128 MB sizing rule.
    val parts = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt)
      .orElse(shufflePartitions).getOrElse(
        math.max(Runtime.getRuntime.availableProcessors(), 2))
    // AQE coalescing makes shuffle parallelism DATA-adaptive both ways:
    // every shuffle STARTS at initialPartitionNum and AQE coalesces down
    // by observed size, so a fixed cores-sized setting no longer under-
    // partitions a 10x-larger shuffle (the sf1 audit measured sort/join
    // spill pushing linear-volume queries ~1.4-1.8x above linear at 32
    // fixed partitions). On a 1000-executor cluster the same config is
    // the standard recommendation: initialPartitionNum sized for the
    // largest shuffle, advisoryPartitionSizeInBytes doing the sizing.
    val initialParts = sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS")
      .map(_.toInt).getOrElse(parts)
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
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
