package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for fact-fact joins at 100 TB. AQE's
  * skew-join splits oversized partitions at runtime; salting is the
  * explicit tool for pathological keys (null keys, default ids,
  * celebrity entities) when you want the redistribution in the plan.
  *
  * The salting here is *targeted*: a cheap pre-aggregate finds the hot
  * keys, and only rows carrying a hot key are salted (probe) or
  * replicated (build). Cold keys — the overwhelming majority at scale —
  * pay one constant-salt column and nothing else. Blanket replication
  * of the whole build side (the naive form) multiplies build-side
  * shuffle volume by the salt factor, which on a fact-sized build is
  * exactly the scale problem salting exists to solve.
  */
object Skew {

  /** Inner equi-join with hot-key two-sided salting. Result is
    * row-identical to `probe.join(build, keys)` — only the shuffle
    * distribution changes.
    *
    * Shape (one scan per side, one shuffle join):
    *   1. hot list = probe keys with count > hotThreshold — a partial
    *      aggregate whose output is distinct-key-sized, then filtered
    *      to the (assumed broadcast-small) hot set.
    *   2. both sides broadcast-join the hot list to attach a flag —
    *      stays inside codegen, no extra exchange.
    *   3. probe: salt = hash(row) % saltFactor where hot, else 0.
    *      build: explode over 0..saltFactor-1 where hot, else [0].
    *   4. single inner join on (key, salt).
    *
    * Cold keys join under constant salt 0 — hash(key, 0) distributes
    * them exactly as well as hash(key). Hot keys spread across
    * saltFactor partitions, with only their build rows replicated.
    *
    * `hotThreshold` must be set so the hot-key list is broadcast-sized
    * (it is collected to the driver by the broadcast join). A sane
    * production value is a few × the target rows-per-task; anything
    * hot at that threshold is by definition a small set of keys.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltFactor: Int, hotThreshold: Long): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    require(hotThreshold > 0, "hotThreshold must be > 0")
    val hot = probe.groupBy(col(key))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > hotThreshold)
      .select(col(key).as("__hotkey"))

    // deterministic salt: a hash of the full probe row, not rand() —
    // reproducible at any parallelism and any retry
    val probeSalt =
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(saltFactor)).cast("int")
    val salted = probe
      .join(broadcast(hot), col(key) === col("__hotkey"), "left")
      .withColumn("__salt", when(col("__hotkey").isNotNull, probeSalt).otherwise(lit(0)))
      .drop("__hotkey")

    // build rows replicate ONLY for hot keys; the arrays are provably
    // non-empty so explode_outer == explode minus the inferred
    // size()>0 filter that would re-evaluate the conditional
    val replicated = build
      .join(broadcast(hot), col(key) === col("__hotkey"), "left")
      .withColumn("__salt", explode_outer(
        when(col("__hotkey").isNotNull, sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hotkey")

    val out = salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
    // restore the caller's expected column order (join key first)
    out.select((key +: out.columns.filterNot(_ == key)).map(col): _*)
  }

  /** Back-compat form: threshold defaults to 4× the probe's mean rows
    * per key would be ideal, but that needs a scan — use an explicit
    * threshold in anything hot-path. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltFactor: Int): DataFrame =
    saltedJoin(probe, build, key, saltFactor, hotThreshold = 1000000L)
}
