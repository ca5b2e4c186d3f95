package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for fact-fact joins at 100 TB: salting
  * spreads a hot key across `saltFactor` shuffle partitions by
  * replicating the build side. AQE's skew-join handles moderate skew
  * at runtime; salting is the explicit tool for the pathological keys
  * you know about (null keys, default ids, celebrity entities).
  */
object Skew {

  /** Inner equi-join with the probe side salted and the build side
    * replicated `saltFactor`×. Result is row-identical to
    * `probe.join(build, keys)` — only the shuffle distribution
    * changes. Use when one/few key values dominate the probe side and
    * the build side is too big to broadcast.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    // deterministic salt: spread probe rows by a hash of the full row,
    // not rand() — reproducible at any parallelism
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    val out = salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
    // restore the caller's expected column order (join key first)
    out.select((key +: out.columns.filterNot(_ == key)).map(col): _*)
  }
}
